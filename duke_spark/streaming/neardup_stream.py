"""Streaming near-duplicate filtering: incremental MinHash-LSH.

``stream_exact_dedup`` (dedup_stream.py) handles byte-identical repeats;
this handles NEAR-duplicates of anything seen in any earlier micro-batch.
State-store keyed operators can't express it directly — a document's
admission depends on ALL of its band buckets (different state keys), so
the decision is cross-key. The standard shape is ``foreachBatch`` against
a persisted bucket table:

  per micro-batch (inside foreachBatch; the source offsets are
  checkpointed, and on epoch REPLAY the bands-first commit order makes
  the replay conservative — already-recorded bands re-drop the same
  docs, so at-least-once never admits a duplicate, it can only re-append
  identical survivor rows, which downstream exact-dedup removes):
    1. batch docs → MinHash signatures → (band_idx, band_hash) rows;
    2. candidates = batch bands ⋈ stored bucket table (semi-join —
       bucket table is parquet partitioned by band_idx, so the join
       prunes to the batch's bands);
    3. within-batch near-dups resolved by the batch-local
       ``near_dup_filter`` (greedy min-id), cross-batch survivors =
       anti-join against candidates;
    4. append survivors' bands to the bucket table, survivors to the
       output sink.

State growth is one row per (surviving doc × bands) — the same footprint
a batch LSH index carries; compaction/TTL is the operator's user policy
(re-write the bucket table from the surviving corpus).

Collisions are CANDIDATE-level here (no jaccard verification against the
historical doc — its text is gone); with 64-hash/16-band signatures a
band collision at jaccard < 0.5 is rare, and the conservative drop is the
usual choice for corpus construction (false drops cost little at TB
scale; false keeps cost training-set duplication).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duke_spark.operators.dedup import minhash_signatures, near_dup_filter


def _bands(sigs: DataFrame, bands: int, id_col: str) -> DataFrame:
    rows_per_band = (F.size("signature") / F.lit(bands)).cast("int")
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("signature"),
                            (b * rows_per_band + F.lit(1)).cast("int"),
                            rows_per_band).cast("string"),
                    b))
        ).alias("band_idx", "band_hash"))


class StreamingNearDupFilter:
    """foreachBatch processor: call ``process(batch_df, epoch_id)`` from
    ``writeStream.foreachBatch``; survivors land in ``out_dir`` parquet,
    band state in ``state_dir``."""

    def __init__(self, out_dir: str, state_dir: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = 64, bands: int = 16,
                 jaccard_threshold: float = 0.8):
        self.out_dir = out_dir
        self.state_dir = state_dir
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.bands = num_hashes, bands
        self.jaccard_threshold = jaccard_threshold

    def compact(self, spark: SparkSession) -> int:
        """Rebuild the band table from the surviving corpus (the TTL /
        compaction policy): recompute signatures over the CURRENT output
        (post any downstream pruning the user did), write a fresh state
        dir atomically via rename. Returns the new band count. Run this
        offline, between streaming runs — not inside foreachBatch."""
        import shutil

        survivors = spark.read.parquet(self.out_dir) \
            .dropDuplicates([self.id_col])
        sigs = minhash_signatures(survivors, self.text_col, self.id_col,
                                  self.num_hashes)
        fresh = _bands(sigs, self.bands, self.id_col) \
            .select("band_idx", "band_hash")
        tmp = self.state_dir.rstrip("/") + ".compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        fresh.write.mode("overwrite").partitionBy("band_idx").parquet(tmp)
        n = spark.read.parquet(tmp).count()
        old = self.state_dir.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(self.state_dir):
            os.replace(self.state_dir, old)
        os.replace(tmp, self.state_dir)
        shutil.rmtree(old, ignore_errors=True)
        return n

    def _stored_bands(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.state_dir):
            return None
        try:
            return spark.read.parquet(self.state_dir)
        except Exception:
            return None

    def process(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # 1. resolve near-dups WITHIN the batch first (full verify path)
        local = near_dup_filter(
            batch, self.text_col, self.id_col, self.num_hashes,
            self.bands, jaccard_threshold=self.jaccard_threshold).persist()
        sigs = minhash_signatures(local, self.text_col, self.id_col,
                                  self.num_hashes)
        my_bands = _bands(sigs, self.bands, self.id_col).persist()
        # 2. drop anything colliding with history
        stored = self._stored_bands(spark)
        if stored is not None:
            hit = (my_bands.join(stored, ["band_idx", "band_hash"],
                                 "left_semi")
                   .select(self.id_col).distinct())
            survivors_ids = (local.select(self.id_col)
                             .join(hit, self.id_col, "left_anti"))
        else:
            survivors_ids = local.select(self.id_col)
        # localCheckpoint BEFORE mutating the state dir: writing to a path
        # invalidates every cached plan that scans it, so a merely-persisted
        # survivors DF would be re-evaluated after the band append and
        # collide with its own bands. Checkpointing materializes the rows
        # AND truncates the lineage, so nothing re-reads the bucket table.
        survivors = local.join(survivors_ids, self.id_col, "left_semi") \
            .localCheckpoint()
        # 3. commit: bands first (re-processing an epoch then re-drops the
        # same docs — idempotent-conservative), then the rows
        new_bands = my_bands.join(survivors.select(self.id_col),
                                  self.id_col, "left_semi") \
            .select("band_idx", "band_hash")
        new_bands.write.mode("append").partitionBy("band_idx") \
            .parquet(self.state_dir)
        survivors.write.mode("append").parquet(self.out_dir)
        for df in (local, my_bands, survivors):
            df.unpersist()
