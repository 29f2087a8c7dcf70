"""Graph materialization (SURVEY B7): vertices + edges DataFrames from
triples and canonical types. GraphFrames-compatible column names
(id/src/dst) but plain DataFrames — no extra dependency.

Spec:
  vertices: id, label, kind(ent|conv|tool), canonical_type, score
    - ent:X   label=X, canonical_type from B6, score=avg(entity_score)
    - conv:C  label=C, canonical_type = canonical type of the entity with
              the highest total score in the conversation (ties → entity
              name desc, i.e. max on the (score, name) pair), score=avg
    - tool:T  label=T, canonical_type=null, score=null
  edges: src, dst, rel, weight=sum(score), n=count — aggregated from
    triples (the top-k emission analogue of Duke's
    ``dataset_descriptor.py:91-97`` generalized to edge weights).

All joins against canonical types are broadcast (≤788 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_edges(triples: DataFrame) -> DataFrame:
    return (triples
            .groupBy(F.col("subj").alias("src"),
                     F.col("pred").alias("rel"),
                     F.col("obj").alias("dst"))
            .agg(F.sum("score").alias("weight"),
                 F.count(F.lit(1)).alias("n"))
            .select("src", "dst", "rel", "weight", "n"))


def build_vertices(mentions: DataFrame, canonical: DataFrame) -> DataFrame:
    """mentions = linked-mention DF; canonical = (entity, canonical_type,
    n_mentions) DF (small → broadcast)."""
    canon = F.broadcast(canonical.select("entity", "canonical_type"))

    ents = (mentions.groupBy("entity")
            .agg(F.avg("entity_score").alias("score"))
            .join(canon, "entity", "left")
            .select(F.concat(F.lit("ent:"), F.col("entity")).alias("id"),
                    F.col("entity").alias("label"),
                    F.lit("ent").alias("kind"),
                    "canonical_type", "score"))

    # conv canonical type = type of its dominant entity: max on the
    # (total score, entity name) pair, so ties break deterministically
    conv_ent = (mentions.groupBy("conv_id", "entity")
                .agg(F.sum("entity_score").alias("tot"),
                     F.avg("entity_score").alias("avg_s")))
    dominant = (conv_ent.groupBy("conv_id")
                .agg(F.expr("max_by(entity, struct(tot, entity))")
                     .alias("entity")))
    convs = (mentions.groupBy("conv_id")
             .agg(F.avg("entity_score").alias("score"))
             .join(dominant, "conv_id", "left")
             .join(canon, "entity", "left")
             .select(F.concat(F.lit("conv:"), F.col("conv_id")).alias("id"),
                     F.col("conv_id").alias("label"),
                     F.lit("conv").alias("kind"),
                     "canonical_type", "score"))

    tools = (mentions.filter(F.col("tool").isNotNull())
             .select("tool").distinct()
             .select(F.concat(F.lit("tool:"), F.col("tool")).alias("id"),
                     F.col("tool").alias("label"),
                     F.lit("tool").alias("kind"),
                     F.lit(None).cast("string").alias("canonical_type"),
                     F.lit(None).cast("double").alias("score")))

    return ents.unionByName(convs).unionByName(tools)
