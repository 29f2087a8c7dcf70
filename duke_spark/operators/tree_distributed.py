"""Distributed hierarchical score aggregation (SURVEY A26, scale shape).

The reference folds its 788-node DBpedia tree on the driver
(``Duke/class_tree.py:63-91``), and so do we (``kernel.tree.tree_score``)
— at C ≤ 788 that is strictly faster. This module is the shape the fold
takes when an ontology outgrows the driver (millions of nodes): a
``(child, parent)`` edge DataFrame and one self-join + hash-aggregate per
tree level, bottom-up — ≤ depth (6 for DBpedia) wide stages total.

Semantics folded: the production agg ``parent_children_funcs(mean, max)``
(``Duke/agg_functions.py:16-23``) — node = mean(own, max(children_agg)),
leaf = own — reproduced exactly: ``(own + max_child) / 2`` equals
``np.mean([own, max])`` bit-for-bit in float64, and ``F.max`` equals
Python ``max`` on doubles. Equality against the kernel fold is tested on
the fixture trees.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duke_spark.kernel.tree import Tree


def tree_heights(tree: Tree) -> Dict[str, int]:
    """Height above the leaf frontier: 0 for leaves/isolated nodes,
    1 + max(child heights) otherwise. Drives the level-synchronous
    schedule (a node aggregates only after every child has)."""
    h: Dict[str, int] = {}

    def height(n: str, stack=()) -> int:
        if n in h:
            return h[n]
        children = tree[n].get("children") or []
        if not children or n in stack:
            h[n] = 0
        else:
            h[n] = 1 + max(height(c, stack + (n,)) for c in children)
        return h[n]

    for n in tree:
        height(n)
    return h


def edges_df(spark: SparkSession, tree: Tree) -> DataFrame:
    rows = [(c, p) for p, rels in tree.items()
            for c in (rels.get("children") or [])]
    return spark.createDataFrame(rows or [("", "")],
                                 ["child", "parent"]).filter(
        F.col("child") != "")


def aggregate_tree_scores_distributed(spark: SparkSession,
                                      scores: DataFrame,
                                      tree: Tree) -> DataFrame:
    """``scores``: (class string, score double) — one row per class.
    Returns (class, agg_score) equal to the kernel fold.

    Per level h: children's aggregated scores are joined to level-h
    parents (broadcast edge list — ontology edges are always the small
    side), max-reduced per parent, then combined with the parent's own
    score. Accumulates levels with unionByName; total wide stages =
    tree depth."""
    heights = tree_heights(tree)
    max_h = max(heights.values(), default=0)
    edges = F.broadcast(edges_df(spark, tree))

    level_of = spark.createDataFrame(
        list(heights.items()), ["class", "h"])
    scored = scores.join(F.broadcast(level_of), "class")

    agg = (scored.filter(F.col("h") == 0)
           .select("class", F.col("score").alias("agg_score")))
    for h in range(1, max_h + 1):
        child_max = (agg.join(edges, agg["class"] == edges["child"])
                     .groupBy("parent")
                     .agg(F.max("agg_score").alias("max_child")))
        level = (scored.filter(F.col("h") == h)
                 .join(child_max,
                       scored["class"] == child_max["parent"], "left")
                 .select(scored["class"],
                         F.when(F.col("max_child").isNotNull(),
                                (F.col("score") + F.col("max_child")) / 2)
                         .otherwise(F.col("score")).alias("agg_score")))
        agg = agg.unionByName(level)
    return agg
