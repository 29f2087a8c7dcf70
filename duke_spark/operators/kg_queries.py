"""Query helpers over the materialized knowledge graph.

The consumer-facing slice: once ``build_kg`` has written vertices/edges,
these are the questions users actually ask of it. All pure Catalyst —
broadcast the (small) vertex dimension where a join is needed, hash
aggregates elsewhere; every helper returns a DataFrame so callers compose
further. Edge vocabulary (``operators.triples``): ``conv:C --mentions-->
ent:E``, ``ent:A --co_mentioned--> ent:B``, ``ent:E --used_tool-->
tool:T``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def type_distribution(vertices: DataFrame) -> DataFrame:
    """Entity count + mean link score per canonical type — the KG-level
    'what is this corpus about' profile."""
    return (vertices.filter(F.col("kind") == "ent")
            .groupBy("canonical_type")
            .agg(F.count(F.lit(1)).alias("n_entities"),
                 F.avg("score").alias("avg_score"))
            .orderBy(F.desc("n_entities"), F.asc("canonical_type")))


def top_entities(vertices: DataFrame, edges: DataFrame,
                 k: int = 10) -> DataFrame:
    """Entities ranked by total incoming mention weight (how much the
    corpus talks about them), with their canonical type."""
    mention_w = (edges.filter(F.col("rel") == "mentions")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("weight").alias("total_weight"),
                      F.sum("n").alias("n_mentions")))
    ents = vertices.filter(F.col("kind") == "ent") \
        .select("id", "label", "canonical_type")
    return (mention_w.join(F.broadcast(ents), "id")
            .orderBy(F.desc("total_weight"), F.asc("id"))
            .limit(k))


def entity_neighbors(edges: DataFrame, entity_label: str,
                     rel: str | None = "co_mentioned") -> DataFrame:
    """Direct neighbors of one entity (either direction), strongest
    first. ``rel=None`` keeps every relation."""
    node = f"ent:{entity_label}"
    e = edges if rel is None else edges.filter(F.col("rel") == rel)
    out_e = (e.filter(F.col("src") == node)
             .select(F.col("dst").alias("neighbor"), "rel", "weight", "n"))
    in_e = (e.filter(F.col("dst") == node)
            .select(F.col("src").alias("neighbor"), "rel", "weight", "n"))
    return (out_e.unionByName(in_e)
            .groupBy("neighbor", "rel")
            .agg(F.sum("weight").alias("weight"), F.sum("n").alias("n"))
            .orderBy(F.desc("weight"), F.asc("neighbor")))


def conversations_about(edges: DataFrame, entity_label: str,
                        k: int = 20) -> DataFrame:
    """Conversations mentioning an entity, by mention weight — the KG
    analogue of a reverse index lookup."""
    return (edges.filter((F.col("rel") == "mentions") &
                         (F.col("dst") == f"ent:{entity_label}"))
            .select(F.col("src").alias("conv"), "weight", "n")
            .orderBy(F.desc("weight"), F.asc("conv"))
            .limit(k))


def tool_usage(edges: DataFrame) -> DataFrame:
    """Which tools get used alongside which entity types of work — the
    agent-transcript question. Rolled up per tool."""
    return (edges.filter(F.col("rel") == "used_tool")
            .groupBy(F.col("dst").alias("tool"))
            .agg(F.countDistinct("src").alias("n_entities"),
                 F.sum("n").alias("n_uses"))
            .orderBy(F.desc("n_uses"), F.asc("tool")))
