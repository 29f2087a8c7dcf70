"""Checkpointed, resumable triple writes with per-partition lineage
(SURVEY B9 — the reference has no analogue; Duke recomputes everything per
request, ``Duke/DukeRestListener.py:43-52``).

Design:
  * deterministic partition ids: ``part_id = pmod(xxhash64(conv_id), P)``
    — stable across runs and cluster sizes (never derived from
    ``spark.default.parallelism``, SURVEY §4 item 4);
  * output parquet partitioned by ``part_id``, written with DYNAMIC
    partition overwrite so a rerun of a partition replaces it atomically
    per-partition (idempotent under mid-job kill);
  * a manifest JSON per completed partition under ``_manifest/`` carrying
    lineage (input path, row count, code version, wall time) — written
    only after the job commits, so a partition is "done" iff its manifest
    exists;
  * resume = filter input to partitions without a manifest (an anti-join
    against the manifest set, done as a pushable IN-filter because the set
    is driver-resident and small).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import duke_spark

MANIFEST_DIR = "_manifest"


TURN_BUCKET = 64


def with_part_id(df: DataFrame, num_parts: int,
                 key: str = "conv_id") -> DataFrame:
    """Deterministic partition id: pmod(xxhash64(conv_id, turn_idx//B), P).

    The turn-bucket salt is the SURVEY B8 skew treatment: a hot
    conversation (30%+ of all turns) would otherwise hash to ONE part and
    straggle every stage keyed by part_id; salting by turn block spreads
    it over ~turns/B parts while staying a pure function of
    (conv_id, turn_idx) — stable across runs and cluster sizes, so
    lineage/resume semantics are unchanged (a triple always lands in the
    same part as the turn it came from)."""
    return df.withColumn(
        "part_id",
        F.pmod(F.xxhash64(F.col(key),
                          F.floor(F.col("turn_idx") / TURN_BUCKET)),
               F.lit(num_parts)).cast("int"))


class TripleCheckpoint:
    def __init__(self, out_dir: str, num_parts: int = 64):
        self.out_dir = out_dir
        self.num_parts = num_parts
        self.manifest_dir = os.path.join(out_dir, MANIFEST_DIR)
        self.data_dir = os.path.join(out_dir, "triples")

    def completed_parts(self) -> Set[int]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("part_") and name.endswith(".json"):
                out.add(int(name[5:-5]))
        return out

    def _write_manifests(self, spark: SparkSession, parts_rows: dict,
                         input_path: str, elapsed: float) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        now = time.time()
        for pid, nrows in parts_rows.items():
            payload = {
                "part_id": pid,
                "rows": nrows,
                "input": input_path,
                "engine_version": duke_spark.__version__,
                "num_parts": self.num_parts,
                "wall_seconds": elapsed,
                "completed_at": now,
            }
            tmp = os.path.join(self.manifest_dir, f".part_{pid}.json.tmp")
            final = os.path.join(self.manifest_dir, f"part_{pid}.json")
            with open(tmp, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, final)  # atomic completion marker

    def _count_written(self, pending) -> dict:
        """Per-partition row counts from parquet footers (driver-side
        pyarrow metadata read — 1 footer per part, no Spark job)."""
        import pyarrow.parquet as pq

        out = {}
        pending_set = set(pending)
        for dirname in os.listdir(self.data_dir):
            if not dirname.startswith("part_id="):
                continue
            pid = int(dirname.split("=", 1)[1])
            if pid not in pending_set:
                continue
            n = 0
            d = os.path.join(self.data_dir, dirname)
            for fn in os.listdir(d):
                if fn.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(d, fn)).metadata.num_rows
            out[pid] = n
        return out

    def run(self, spark: SparkSession, transcripts: DataFrame, ctx_bc,
            input_path: str = "", max_parts: Optional[int] = None) -> dict:
        """Extract + write triples for all pending partitions.

        ``max_parts`` processes only that many pending partitions (used by
        the kill/resume test to simulate a mid-job stop at a partition
        boundary). Returns {"written": [...], "skipped": n, "rows": n}.
        """
        from duke_spark.operators.triples import extract_triples

        done = self.completed_parts()
        pending = sorted(set(range(self.num_parts)) - done)
        if max_parts is not None:
            pending = pending[:max_parts]
        if not pending:
            return {"written": [], "skipped": len(done), "rows": 0}

        t0 = time.time()
        parted = with_part_id(transcripts, self.num_parts)
        if len(pending) < self.num_parts:
            parted = parted.filter(F.col("part_id").isin(pending))
        # Extraction runs on the input's own (round-robin/cache) layout —
        # feeding the pandas-UDF stage from a shuffle read measured ~50%
        # slower than from cache, and the narrow stage doesn't care about
        # row placement. The OUTPUT is then clustered by (salted) part_id
        # so each writer task holds ~one partition value: with
        # maxConcurrentOutputFileWriters set (config.py) the partitioned
        # write needs no sort and emits ~one file per part at ANY
        # parallelism. Un-clustered partitionBy writes tasks × parts small
        # files and the file commit dominates at high parallelism.
        # part_id is a pure function of (conv_id, turn_idx) → recomputed on
        # the output rather than threaded through the UDF (keeps the UDF
        # schema minimal; Catalyst prunes the input column).
        triples = extract_triples(parted, ctx_bc)
        triples = with_part_id(triples, self.num_parts)
        triples = triples.repartition(self.num_parts, "part_id")
        (triples.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("part_id")
         .parquet(self.data_dir))
        elapsed = time.time() - t0

        parts_rows = self._count_written(pending)
        # pending partitions that produced zero triples still complete
        for pid in pending:
            parts_rows.setdefault(pid, 0)
        self._write_manifests(spark, parts_rows, input_path, elapsed)
        return {"written": sorted(parts_rows), "skipped": len(done),
                "rows": int(sum(parts_rows.values())),
                "wall_seconds": elapsed}

    def read_triples(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.data_dir).drop("part_id")
