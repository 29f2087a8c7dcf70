"""Bucketed tables for co-located (shuffle-free) joins.

The brief's scale checklist calls for "bucketing for co-located joins":
when two large tables are repeatedly joined on the same key (documents ⋈
per-doc features, edges ⋈ vertices, ...), pre-hash-bucketing both sides
on the join key at write time removes the per-query Exchange — at 100 TB
that is the difference between re-shuffling the fact table on every join
and a scan-local sort-merge join.

Spark exposes bucketing only through the table catalog
(``DataFrameWriter.bucketBy`` + ``saveAsTable``; plain ``.parquet()``
paths don't carry bucket metadata). The session's warehouse dir is
configured in ``duke_spark.config``. The no-Exchange property is
asserted on the physical plan in ``tests/test_bucketing.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 16,
                   sort_cols: Optional[Sequence[str]] = None) -> None:
    """Persist ``df`` as a managed parquet table hash-bucketed on
    ``bucket_col`` (optionally sorted within buckets, which lets the
    sort-merge join skip its sort too)."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, bucket_col))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``on`` with the same bucket count —
    compiles to a SortMergeJoin with NO Exchange on either side (each
    task reads matching bucket files from both tables)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
