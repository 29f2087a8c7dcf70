"""Streaming deduplication — the incremental form of the corpus-cleaning
exact-dedup stage (``operators.dedup.exact_dedup``).

A continuously-ingested corpus can't re-shuffle history per batch;
Structured Streaming's ``dropDuplicatesWithinWatermark`` keeps a
state-store entry per content key and emits only first-seen documents.
The content key is the md5 of whitespace-normalized text (the same key
``fingerprint_docs`` uses), so state is 16 bytes-ish per distinct doc
instead of the text itself; the watermark bounds state: a duplicate
arriving later than the watermark delay past its original may be
re-emitted (the standard state/recall tradeoff — size the delay to the
ingest pipeline's max disorder).

At scale the state store shards by the dedup key across executors
(HDFS/RocksDB-backed), so state volume is distributed like any keyed
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_key(df: DataFrame, text_col: str = "text",
                     out_col: str = "content_key") -> DataFrame:
    """Stable dedup key: md5 of trimmed, whitespace-collapsed text."""
    normalized = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.md5(normalized.cast("binary")))


def stream_exact_dedup(docs: DataFrame, ts_col: str = "ts",
                       text_col: str = "text",
                       watermark: str = "10 minutes") -> DataFrame:
    """First-seen documents only, keyed by content fingerprint, with
    bounded state. ``docs`` must be a streaming DataFrame carrying an
    event-time column ``ts_col``."""
    keyed = with_content_key(docs, text_col)
    return (keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_key"])
            .drop("content_key"))
