"""Transcript source (SURVEY B1): Iceberg table in production, parquet in
tests — same explicit schema either way so Catalyst prunes/pushes down
identically. Analogue of the reference's header-required CSV scan
(``Duke/dataset.py:37``) with schema made explicit instead of inferred.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read the transcript table. ``fmt='iceberg'`` is the production path
    (catalog table name in ``path``); parquet is the test/bench path;
    ``csv`` is the reference-parity path (header row required, like
    ``Duke/dataset.py:37`` — but with the schema explicit, never
    inferred, so types and pushdown are stable)."""
    if fmt == "iceberg":
        from duke_spark.sources import iceberg_lite
        if iceberg_lite.is_iceberg_lite_table(path):
            # jar-free spec-based path (metadata JSON → Avro manifests →
            # pruned parquet); used when ``path`` is a directory table
            df = iceberg_lite.read_table(spark, path)
        else:
            # catalog table via the real Iceberg runtime (requires jars)
            df = spark.read.format("iceberg").load(path)
    elif fmt == "csv":
        df = (spark.read.schema(TRANSCRIPT_SCHEMA)
              .option("header", True)
              .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
              .csv(path))
    else:
        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    return df


def clean_turns(df: DataFrame) -> DataFrame:
    """Relational pre-filters expressed in DataFrame API so Catalyst pushes
    them into the scan (SURVEY §4: express NULL/text filters before the UDF;
    analogue of the reference's NaN drop ``Duke/dataset.py:53``)."""
    return df.filter(F.col("text").isNotNull() & (F.length("text") > 0))


def stable_turn_order(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Per-turn stable ordering invariant (SURVEY B2): co-locate each
    conversation and sort within partitions by (conv_id, turn_idx)."""
    parted = (df.repartition(num_partitions, "conv_id") if num_partitions
              else df.repartition("conv_id"))
    return parted.sortWithinPartitions("conv_id", "turn_idx")
