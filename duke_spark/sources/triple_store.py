"""Predicate-partitioned triple store: the physical layout for BGP
constants.

A knowledge graph's triple table is queried overwhelmingly by constant
predicate (``?c mentions ?e``, ``?e co_mentioned ?x`` — every element of
``operators.pattern``'s BGPs binds pred far more often than subj/obj,
mirroring SPARQL workloads and the reference's fixed per-relation edge
tables, ``Duke/dataset_descriptor.py``). Hive-style ``partitionBy(pred)``
turns those constants into PARTITION pruning — the scan never opens the
other predicates' files — which is strictly stronger than the row-group
``PushedFilters`` the flat layout gives: at 100 TB a ``mentions``-only
query over a store that is 90% ``co_mentioned`` reads 10% of the bytes.

Safe because the predicate vocabulary is tiny and closed (a KG schema has
tens of relations, not millions): the directory fan-out is bounded, and
each writing task appends to at most |preds| files. The write stays
task-parallel (NO ``repartition("pred")`` first — that would funnel each
predicate through one reducer, the exact skew this repo salts against
elsewhere); small-file pressure is bounded by tasks × |preds| and
collapsed by ``coalesce_small`` for the local case.

``read_triple_store`` restores the canonical column order (Hive layout
moves the partition column last) so downstream code — match_pattern,
validate_graph, fact_support — sees the same frame it would from the
flat store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CANON_FIRST = ("conv_id", "turn_idx", "subj", "pred", "obj", "score")


def write_triple_store(triples: DataFrame, path: str,
                       coalesce_small: int | None = None) -> None:
    """Write ``triples`` as a Hive-partitioned parquet store keyed on
    ``pred``. ``coalesce_small``: optionally cap the task count first
    (local/test stores; leave None on a cluster — the parallel write IS
    the point)."""
    df = triples
    if coalesce_small:
        df = df.coalesce(coalesce_small)
    df.write.mode("overwrite").partitionBy("pred").parquet(path)


def read_triple_store(spark: SparkSession, path: str) -> DataFrame:
    """Read a store written by :func:`write_triple_store`, with columns
    restored to canonical order. Constant-``pred`` filters on the result
    resolve as PartitionFilters (plan-asserted in
    ``tests/test_pattern.py``)."""
    df = spark.read.parquet(path)
    front = [c for c in _CANON_FIRST if c in df.columns]
    rest = [c for c in df.columns if c not in front]
    return df.select(*front, *rest)
