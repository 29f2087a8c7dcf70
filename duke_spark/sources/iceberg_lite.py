"""iceberg-lite: a spec-based, jar-free reader/writer for Iceberg-style
tables, so the production-source path (SURVEY B1; north-rule "Iceberg
tables of transcripts") actually EXECUTES in this sandbox.

The real ``iceberg-spark-runtime`` jar is absent and there is no network
to fetch it, so ``spark.read.format("iceberg")`` can never run here.
Rather than ship a permanently-untested branch, this module implements
the public Apache Iceberg table-format layout
(https://iceberg.apache.org/spec/) end to end:

    <table>/metadata/v<N>.metadata.json      table metadata + snapshot log
    <table>/metadata/snap-<id>.avro          manifest list   (real Avro)
    <table>/metadata/manifest-<id>-m<k>.avro manifest files  (real Avro)
    <table>/data/<part>=.../<file>.parquet   data files      (Spark parquet)

and the read flow the spec prescribes: metadata JSON → current (or
time-travel) snapshot → Avro manifest list → Avro manifests → pruned
parquet file set → ``spark.read.parquet``. The Avro files are genuine
Avro object container files (``kernel/avro_lite.py``), verified against
the official Apache Avro Java library in tests.

Documented simplifications vs the full spec (each keeps the *flow*
faithful while shrinking surface):
  - single partition spec (identity transforms only), spec-id 0;
  - ``data_file.partition`` and column bounds are string-keyed maps with
    JSON-encoded values instead of field-id-keyed typed structs;
  - no delete files / row-level deletes (append + overwrite only);
  - ``null`` Avro codec.

Scale notes: the reader never touches parquet footers at planning time —
pruning uses manifest-recorded partition values plus per-file column
bounds (harvested once at write time from parquet row-group statistics
via pyarrow), exactly the metadata-tree design that lets Iceberg plan a
10^12-row scan without listing directories. Planning cost is
O(manifest entries), not O(data).

No reference analogue to copy (the reference ingests CSV only,
``Duke/dataset.py:37``); the production-source role comes from the
north rule.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from duke_spark.kernel import avro_lite

FORMAT_VERSION = 2

# Avro schemas for the two metadata file kinds (subset of the spec's
# manifest-list and manifest-entry schemas; field names match the spec).
MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "added_data_files_count", "type": ["null", "int"], "default": None},
        {"name": "added_rows_count", "type": ["null", "long"], "default": None},
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},  # 0=existing 1=added 2=deleted
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file",
            "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                # simplification: identity-partition values as strings
                {"name": "partition", "type": {"type": "map", "values": "string"}},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                # simplification: JSON-encoded min/max per column name
                {"name": "lower_bounds", "type": ["null", {"type": "map", "values": "string"}], "default": None},
                {"name": "upper_bounds", "type": ["null", {"type": "map", "values": "string"}], "default": None},
            ],
        }},
    ],
}


def _metadata_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _snapshot_id(path: str, version: int) -> int:
    """Deterministic 63-bit snapshot id from table path + version."""
    import hashlib
    h = hashlib.md5(f"{path}#{version}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFFFFFFFFFFFFFF


def is_iceberg_lite_table(path: str) -> bool:
    md = _metadata_dir(path)
    return os.path.isdir(md) and any(
        f.endswith(".metadata.json") for f in os.listdir(md))


def _current_metadata_file(path: str) -> str:
    md = _metadata_dir(path)
    versions = sorted(
        (int(f.split(".")[0][1:]), f)
        for f in os.listdir(md) if f.endswith(".metadata.json"))
    if not versions:
        raise FileNotFoundError(f"{path}: no metadata.json (not a table?)")
    return os.path.join(md, versions[-1][1])


def _load_metadata(path: str) -> dict:
    with open(_current_metadata_file(path)) as f:
        return json.load(f)


# ------------------------------------------------------------------- write


def _harvest_parquet_stats(file_path: str, bound_cols: list[str]
                           ) -> tuple[int, int, dict, dict]:
    """(record_count, file_size, lower_bounds, upper_bounds) from the
    parquet footer — row-group statistics, no data read."""
    import pyarrow.parquet as pq
    meta = pq.ParquetFile(file_path).metadata
    lowers: dict[str, Any] = {}
    uppers: dict[str, Any] = {}
    name_to_idx = {meta.schema.column(i).name: i
                   for i in range(len(meta.schema))}
    for col in bound_cols:
        idx = name_to_idx.get(col)
        if idx is None:
            continue
        lo = hi = None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            lowers[col] = json.dumps(lo, default=str)
            uppers[col] = json.dumps(hi, default=str)
    return meta.num_rows, os.path.getsize(file_path), lowers, uppers


def _list_data_files(data_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _partition_values(file_path: str, data_dir: str) -> dict[str, str]:
    """Hive-style ``k=v`` path segments between data_dir and the file."""
    rel = os.path.relpath(os.path.dirname(file_path), data_dir)
    vals: dict[str, str] = {}
    if rel not in (".", ""):
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, v = seg.split("=", 1)
                vals[k] = v
    return vals


def write_table(spark: SparkSession, df: DataFrame, path: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite",
                bound_cols: list[str] | None = None) -> int:
    """Write ``df`` as an iceberg-lite table; returns the new snapshot id.

    ``mode='overwrite'`` starts a fresh table (snapshot history kept in
    the metadata log); ``mode='append'`` adds a new snapshot whose
    manifest list is the previous snapshot's manifests plus one new
    manifest for the appended files — exactly the spec's append commit.
    ``bound_cols`` selects columns whose parquet min/max are recorded in
    the manifest for file skipping (default: all non-partition columns).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    data_dir = os.path.join(path, "data")
    md_dir = _metadata_dir(path)
    if mode == "overwrite" and os.path.isdir(md_dir):
        # a fresh table: drop stale metadata so the highest-version
        # metadata.json is always the one written below
        for f in os.listdir(md_dir):
            if f.endswith((".metadata.json", ".avro")):
                os.remove(os.path.join(md_dir, f))
    os.makedirs(md_dir, exist_ok=True)

    prev_meta = None
    prev_files: set[str] = set()
    if mode == "append" and is_iceberg_lite_table(path):
        prev_meta = _load_metadata(path)
        for mf in _manifests_for_snapshot(
                prev_meta, prev_meta["current-snapshot-id"]):
            for e in _read_manifest(mf):
                prev_files.add(e["data_file"]["file_path"])
        partition_by = prev_meta.get("_lite_partition_by") or partition_by

    writer = df.write.mode("append" if mode == "append" else "overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    all_files = _list_data_files(data_dir)
    new_files = [f for f in all_files if f not in prev_files] \
        if mode == "append" else all_files

    bcols = bound_cols if bound_cols is not None else [
        c for c in df.columns if c not in (partition_by or [])]
    entries = []
    total_rows = 0
    snap_version = (prev_meta["_lite_version"] + 1) if prev_meta else 1
    snap_id = _snapshot_id(path, snap_version)
    for f in new_files:
        nrows, size, lowers, uppers = _harvest_parquet_stats(f, bcols)
        total_rows += nrows
        entries.append({
            "status": 1, "snapshot_id": snap_id,
            "data_file": {
                "file_path": f, "file_format": "PARQUET",
                "partition": _partition_values(f, data_dir),
                "record_count": nrows, "file_size_in_bytes": size,
                "lower_bounds": lowers or None,
                "upper_bounds": uppers or None,
            },
        })

    manifest_path = os.path.join(
        md_dir, f"manifest-{snap_id:016x}-m0.avro")
    avro_lite.write_container(manifest_path, MANIFEST_ENTRY_SCHEMA, entries,
                              sync_seed=f"manifest#{snap_id}")

    list_entries = [{
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "added_snapshot_id": snap_id,
        "added_data_files_count": len(entries),
        "added_rows_count": total_rows,
    }]
    if prev_meta:
        prev_list = os.path.join(
            md_dir, os.path.basename(_snapshot(
                prev_meta, prev_meta["current-snapshot-id"])["manifest-list"]))
        _schema, prev_entries = avro_lite.read_container(prev_list)
        # reuse prior manifests: spec's fast-append commit
        list_entries = prev_entries + list_entries

    list_path = os.path.join(md_dir, f"snap-{snap_id}.avro")
    avro_lite.write_container(list_path, MANIFEST_LIST_SCHEMA, list_entries,
                              sync_seed=f"snap#{snap_id}")

    snapshots = (prev_meta["snapshots"] if prev_meta else []) + [{
        "snapshot-id": snap_id,
        "sequence-number": snap_version,
        "manifest-list": list_path,
        "summary": {"operation": "append" if prev_meta else "overwrite",
                    "added-data-files": str(len(entries)),
                    "added-records": str(total_rows)},
    }]
    meta = {
        "format-version": FORMAT_VERSION,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, path)),
        "location": path,
        "current-snapshot-id": snap_id,
        "snapshots": snapshots,
        "snapshot-log": [{"snapshot-id": s["snapshot-id"]}
                         for s in snapshots],
        "partition-specs": [{
            "spec-id": 0,
            "fields": [{"name": c, "transform": "identity",
                        "source-name": c}
                       for c in (partition_by or [])],
        }],
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": [{"id": i + 1, "name": f.name,
                                 "type": f.dataType.simpleString(),
                                 "required": not f.nullable}
                                for i, f in enumerate(df.schema.fields)]}],
        "_lite_partition_by": partition_by or [],
        "_lite_version": snap_version,
    }
    with open(os.path.join(md_dir, f"v{snap_version}.metadata.json"),
              "w") as f:
        json.dump(meta, f, indent=1)
    return snap_id


# -------------------------------------------------------------------- read


def _snapshot(meta: dict, snapshot_id: int) -> dict:
    for s in meta["snapshots"]:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise KeyError(f"snapshot {snapshot_id} not in table "
                   f"(have {[s['snapshot-id'] for s in meta['snapshots']]})")


def _manifests_for_snapshot(meta: dict, snapshot_id: int) -> list[str]:
    list_path = _snapshot(meta, snapshot_id)["manifest-list"]
    _schema, entries = avro_lite.read_container(list_path)
    return [e["manifest_path"] for e in entries]


def _read_manifest(manifest_path: str) -> list[dict]:
    _schema, entries = avro_lite.read_container(manifest_path)
    return [e for e in entries if e["status"] != 2]


@dataclass
class ScanPlan:
    """Result of metadata-only planning: which files survive pruning."""
    files: list[str]
    total_files: int
    pruned_by_partition: int = 0
    pruned_by_bounds: int = 0
    planned_rows: int = 0


def plan_scan(path: str, snapshot_id: int | None = None,
              partition_filter: dict[str, str] | None = None,
              bounds_filter: dict[str, tuple[Any, Any]] | None = None
              ) -> ScanPlan:
    """Plan a scan from metadata alone (no parquet footer reads).

    ``partition_filter``: {col: value} equality on identity-partition
    columns — files from other partitions are skipped.
    ``bounds_filter``: {col: (lo, hi)} closed ranges; a file is skipped
    when its manifest-recorded [min, max] for ``col`` is disjoint from
    [lo, hi] (None = unbounded on that side). Files lacking bounds are
    conservatively kept.
    """
    meta = _load_metadata(path)
    snap = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    files: list[str] = []
    total = part_pruned = bound_pruned = rows = 0
    for mf in _manifests_for_snapshot(meta, snap):
        for e in _read_manifest(mf):
            df_ = e["data_file"]
            total += 1
            if partition_filter and any(
                    df_["partition"].get(k) != str(v)
                    for k, v in partition_filter.items()):
                part_pruned += 1
                continue
            if bounds_filter and _bounds_disjoint(df_, bounds_filter):
                bound_pruned += 1
                continue
            files.append(df_["file_path"])
            rows += df_["record_count"]
    return ScanPlan(files=sorted(set(files)), total_files=total,
                    pruned_by_partition=part_pruned,
                    pruned_by_bounds=bound_pruned, planned_rows=rows)


def _bounds_disjoint(data_file: dict,
                     bounds_filter: dict[str, tuple[Any, Any]]) -> bool:
    lowers = data_file.get("lower_bounds") or {}
    uppers = data_file.get("upper_bounds") or {}
    for col, (lo, hi) in bounds_filter.items():
        if col not in lowers:
            continue  # no stats → keep (conservative)
        fmin = json.loads(lowers[col])
        fmax = json.loads(uppers[col])
        if hi is not None and fmin is not None and fmin > hi:
            return True
        if lo is not None and fmax is not None and fmax < lo:
            return True
    return False


def read_table(spark: SparkSession, path: str,
               snapshot_id: int | None = None,
               partition_filter: dict[str, str] | None = None,
               bounds_filter: dict[str, tuple[Any, Any]] | None = None,
               schema=None) -> DataFrame:
    """Read an iceberg-lite table as a DataFrame.

    Planning is metadata-only (``plan_scan``); the returned DataFrame
    scans exactly the surviving parquet files, with ``basePath`` set so
    Hive-style partition columns are reconstructed. ``snapshot_id``
    gives time travel to any snapshot in the log.
    """
    plan = plan_scan(path, snapshot_id, partition_filter, bounds_filter)
    if not plan.files:
        # empty selection: preserve schema via zero-row read of the table
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        full = reader.option("basePath", os.path.join(path, "data")) \
            .parquet(os.path.join(path, "data"))
        return full.limit(0)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("basePath", os.path.join(path, "data")) \
        .parquet(*plan.files)


def snapshots(path: str) -> list[dict]:
    """The table's snapshot log (oldest first): id, sequence, summary."""
    return list(_load_metadata(path)["snapshots"])
