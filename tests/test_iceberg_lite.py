"""iceberg-lite: the jar-free Iceberg-layout path (SURVEY B1) actually
executes — Avro codec conformance (vs the official Apache Avro JAVA
library bundled in Spark's JVM), table round-trip, append snapshots +
time travel, and metadata-only partition/bounds pruning.
"""

import io
import os

import pytest

from duke_spark.kernel import avro_lite
from duke_spark.sources import iceberg_lite
from duke_spark.sources.transcripts import read_transcripts

NESTED_SCHEMA = {
    "type": "record", "name": "outer",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "maybe", "type": ["null", "double"], "default": None},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kv", "type": {"type": "map", "values": "long"}},
        {"name": "inner", "type": {
            "type": "record", "name": "inner_r",
            "fields": [{"name": "b", "type": "boolean"},
                       {"name": "raw", "type": "bytes"}]}},
    ],
}

RECORDS = [
    {"s": "héllo", "n": -(2 ** 40) - 7, "maybe": None,
     "tags": ["a", "b", ""], "kv": {"x": 1, "y": -9999999999},
     "inner": {"b": True, "raw": b"\x00\xff\x10"}},
    {"s": "", "n": 0, "maybe": 3.25,
     "tags": [], "kv": {},
     "inner": {"b": False, "raw": b""}},
]


def test_avro_codec_roundtrip(tmp_path):
    p = str(tmp_path / "t.avro")
    avro_lite.write_container(p, NESTED_SCHEMA, RECORDS, sync_seed="x")
    schema, got = avro_lite.read_container(p)
    assert schema["name"] == "outer"
    assert got == RECORDS


def test_avro_zigzag_longs():
    for v in [0, -1, 1, 63, -64, 64, 2 ** 62, -(2 ** 62), 1234567890123]:
        buf = io.BytesIO()
        avro_lite.write_long(buf, v)
        buf.seek(0)
        assert avro_lite.read_long(buf) == v


def test_avro_java_library_reads_our_files(spark, tmp_path):
    """Spec conformance: the official Apache Avro Java implementation
    (avro-1.x jar bundled with Spark) must parse files written by
    avro_lite byte-for-byte — schema, metadata map, sync markers, block
    framing, and every value."""
    p = str(tmp_path / "conf.avro")
    avro_lite.write_container(p, NESTED_SCHEMA, RECORDS, sync_seed="conf")
    jvm = spark.sparkContext._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), reader)
    try:
        got = []
        while dfr.hasNext():
            rec = dfr.next()
            got.append({
                "s": rec.get("s").toString(),
                "n": rec.get("n"),
                "maybe": rec.get("maybe"),
                "tags": [t.toString() for t in rec.get("tags")],
                "kv": {k.toString(): v
                       for k, v in dict(rec.get("kv")).items()},
                "b": rec.get("inner").get("b"),
            })
    finally:
        dfr.close()
    assert len(got) == 2
    assert got[0]["s"] == "héllo"
    assert got[0]["n"] == RECORDS[0]["n"]
    assert got[0]["maybe"] is None
    assert got[0]["tags"] == ["a", "b", ""]
    assert got[0]["kv"] == {"x": 1, "y": -9999999999}
    assert got[0]["b"] is True
    assert got[1]["maybe"] == 3.25


@pytest.fixture(scope="module")
def lite_table(spark, tiny_transcripts, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "transcripts_tbl")
    snap = iceberg_lite.write_table(
        spark, tiny_transcripts, path, partition_by=["role"])
    return path, snap


def _sorted_rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in df.select("conv_id", "turn_idx", "role", "text").collect())


def test_table_roundtrip_text_equality(spark, tiny_transcripts, lite_table):
    """North-rule invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, parquet vs iceberg-lite."""
    path, _snap = lite_table
    got = iceberg_lite.read_table(spark, path)
    assert set(got.columns) == set(tiny_transcripts.columns)
    assert _sorted_rows(got) == _sorted_rows(tiny_transcripts)


def test_layout_is_iceberg_shaped(lite_table):
    path, snap = lite_table
    md = os.path.join(path, "metadata")
    names = sorted(os.listdir(md))
    assert any(n.endswith(".metadata.json") for n in names)
    assert any(n.startswith("snap-") and n.endswith(".avro") for n in names)
    assert any(n.startswith("manifest-") for n in names)
    # manifest list is genuine Avro naming the manifest, which names files
    schema, entries = avro_lite.read_container(
        os.path.join(md, f"snap-{snap}.avro"))
    assert schema["name"] == "manifest_file"
    assert entries[0]["added_rows_count"] > 0
    _s, m_entries = avro_lite.read_container(entries[0]["manifest_path"])
    assert all(e["data_file"]["file_path"].endswith(".parquet")
               for e in m_entries)


def test_read_transcripts_iceberg_fmt(spark, tiny_transcripts, lite_table):
    path, _snap = lite_table
    got = read_transcripts(spark, path, fmt="iceberg")
    assert _sorted_rows(got) == _sorted_rows(tiny_transcripts)


def test_partition_pruning_metadata_only(spark, tiny_transcripts, lite_table):
    path, _snap = lite_table
    plan = iceberg_lite.plan_scan(path, partition_filter={"role": "tool"})
    full = iceberg_lite.plan_scan(path)
    assert plan.pruned_by_partition > 0
    assert len(plan.files) < len(full.files)
    got = iceberg_lite.read_table(spark, path,
                                  partition_filter={"role": "tool"})
    want = tiny_transcripts.filter("role = 'tool'")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_bounds_file_skipping(spark, tiny_transcripts, tmp_path):
    """Per-file min/max harvested from parquet footers at write time
    prune files at plan time for range predicates (no footer reads when
    planning)."""
    path = str(tmp_path / "bounds_tbl")
    # partition by conv_id so files have disjoint turn_idx ranges is NOT
    # guaranteed; instead write unpartitioned but repartition by range so
    # each file covers a narrow turn_idx band.
    df = tiny_transcripts.repartitionByRange(4, "turn_idx")
    iceberg_lite.write_table(spark, df, path)
    hi = iceberg_lite.plan_scan(path, bounds_filter={"turn_idx": (50, None)})
    full = iceberg_lite.plan_scan(path)
    assert hi.pruned_by_bounds > 0
    assert len(hi.files) < len(full.files)
    got = iceberg_lite.read_table(spark, path,
                                  bounds_filter={"turn_idx": (50, None)})
    # pruning is conservative: result filtered exactly must match
    want = tiny_transcripts.filter("turn_idx >= 50")
    assert _sorted_rows(got.filter("turn_idx >= 50")) == _sorted_rows(want)


def test_append_snapshots_and_time_travel(spark, tiny_transcripts, tmp_path):
    path = str(tmp_path / "tt_tbl")
    snap1 = iceberg_lite.write_table(spark, tiny_transcripts, path,
                                     partition_by=["role"])
    extra = tiny_transcripts.limit(7).selectExpr(
        "concat(conv_id, '_b') AS conv_id", "turn_idx", "role", "text",
        "tool", "ts")
    snap2 = iceberg_lite.write_table(spark, extra, path, mode="append")
    log = iceberg_lite.snapshots(path)
    assert [s["snapshot-id"] for s in log] == [snap1, snap2]
    n1 = tiny_transcripts.count()
    assert iceberg_lite.read_table(spark, path).count() == n1 + 7
    # time travel to the first snapshot sees only the original rows
    old = iceberg_lite.read_table(spark, path, snapshot_id=snap1)
    assert old.count() == n1
    assert _sorted_rows(old) == _sorted_rows(tiny_transcripts)


def test_kg_triples_parity_parquet_vs_iceberg(spark, tiny_transcripts,
                                              ctx_bc, lite_table):
    """Contract-adjacent smoke (VERDICT r3 #2): triple extraction over the
    iceberg-lite table equals the parquet path exactly."""
    from duke_spark.operators.triples import extract_triples
    from duke_spark.sources.transcripts import clean_turns, stable_turn_order
    path, _snap = lite_table

    def run(df):
        t = extract_triples(stable_turn_order(clean_turns(df), 4), ctx_bc)
        return sorted(map(tuple, t.select("conv_id", "turn_idx", "subj",
                                          "pred", "obj").collect()))

    assert run(read_transcripts(spark, path, fmt="iceberg")) == \
        run(tiny_transcripts)
