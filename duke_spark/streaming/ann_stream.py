"""Incremental (streaming) ingest into the persisted ANN index —
completes the build-once / query-many lifecycle of
``operators.ann_index`` with append-as-vectors-arrive.

Shape mirrors ``streaming.neardup_stream``: a ``foreachBatch`` processor
against the bucket-partitioned parquet index. Per micro-batch:

  1. assign each new vector its bucket with the SAME rule the index was
     built with (read from the ``_meta.json`` sidecar — plane family,
     seed, dim), so queries keep pruning correctly;
  2. append ``partitionBy(bucket)`` — the same row schema the batch
     build writes, so readers never face schema drift.

Replay safety: appends are idempotent-by-dedup — a replayed epoch
re-appends byte-identical (id, vector, bucket) rows, and the query path
drops duplicate ids before top-k (`ann_index.query_lsh_index`), so
at-least-once delivery can repeat rows but never distort results.
``compact()`` rewrites the index without duplicates (the maintenance
hook, same tmp-swap pattern as the near-dup band table).

At scale: each micro-batch writes only the partitions its vectors land
in; file counts grow with (batches × buckets-hit) until ``compact()``
folds them — the standard streaming-ingest + background-compaction
contract of every LSM-ish store.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from duke_spark.operators.ann_index import DATA_DIR, _read_meta
from duke_spark.operators.similarity import coord_sign_bucket, lsh_bucket_ids


class StreamingAnnIndexWriter:
    """foreachBatch processor appending vectors to an existing LSH index
    (built by ``ann_index.build_lsh_index``)."""

    def __init__(self, path: str):
        self.path = path
        self.meta = _read_meta(path)
        if self.meta["kind"] != "lsh":
            raise ValueError("streaming append currently supports LSH "
                             f"indexes, not {self.meta['kind']!r}")

    def _assign(self, batch: DataFrame) -> DataFrame:
        m = self.meta
        base = batch.select(m["id_col"], m["vec_col"])
        if m["planes"] == "coord":
            return base.withColumn(
                "bucket", coord_sign_bucket(m["vec_col"], m["num_planes"]))
        return lsh_bucket_ids(base, m["dim"], m["num_planes"], m["seed"],
                              m["vec_col"])

    def process(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        (self._assign(batch)
         .write.mode("append").partitionBy("bucket")
         .parquet(os.path.join(self.path, DATA_DIR)))

    def compact(self, spark: SparkSession) -> int:
        """Rewrite the index deduped (replayed epochs fold away) and
        re-partitioned one-dir-per-bucket. Returns the row count."""
        m = self.meta
        data_dir = os.path.join(self.path, DATA_DIR)
        cur = spark.read.parquet(data_dir).dropDuplicates([m["id_col"]])
        tmp = data_dir.rstrip("/") + ".compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (cur.repartition("bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(tmp))
        n = spark.read.parquet(tmp).count()
        old = data_dir.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(data_dir, old)
        os.replace(tmp, data_dir)
        shutil.rmtree(old, ignore_errors=True)
        return n
