"""Iceberg smoke (SURVEY B1, VERDICT r2 #9): the ``fmt='iceberg'`` hook
in ``sources.transcripts`` is declared but unproven in this sandbox (no
Iceberg runtime jars). This test detects the runtime at collection time:
with jars present it exercises a real write → ``read_transcripts`` round
trip; without, it SKIPS with an explicit reason instead of silently
passing.
"""

import pytest


def _iceberg_available(spark) -> bool:
    try:
        spark.conf.set("spark.sql.catalog.ice_t",
                       "org.apache.iceberg.spark.SparkCatalog")
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_roundtrip_or_skip(spark, tmp_path):
    if not _iceberg_available(spark):
        pytest.skip("Iceberg runtime jars not on the classpath in this "
                    "sandbox; fmt='iceberg' hook remains declared-untested")
    import pandas as pd

    from duke_spark.sources.transcripts import read_transcripts
    spark.conf.set("spark.sql.catalog.ice_t.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice_t.warehouse",
                   str(tmp_path / "warehouse"))
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c1"], "turn_idx": [0, 1],
        "role": ["user", "assistant"],
        "text": ["hello there", "general reply"],
        "tool": [None, None],
    })
    spark.createDataFrame(pdf).writeTo("ice_t.db.transcripts") \
        .using("iceberg").createOrReplace()
    got = read_transcripts(spark, "ice_t.db.transcripts", fmt="iceberg")
    assert got.count() == 2
    assert set(got.columns) >= {"conv_id", "turn_idx", "role", "text"}
