"""Transcript source formats: parquet/CSV round-trip equality, cleaning,
stable turn ordering."""

import pandas as pd
from pyspark.sql import functions as F

from duke_spark.sources.transcripts import (clean_turns, read_transcripts,
                                            stable_turn_order)


def test_csv_equals_parquet(spark, tiny_transcripts_pdf, tmp_path):
    pq = str(tmp_path / "t.parquet")
    cv = str(tmp_path / "t.csv")
    tiny_transcripts_pdf.to_parquet(pq, index=False)
    pdf = tiny_transcripts_pdf.copy()
    pdf["ts"] = pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
    pdf.to_csv(cv, index=False)

    a = read_transcripts(spark, pq).toPandas()
    b = read_transcripts(spark, cv, fmt="csv").toPandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_clean_turns_pushdown(spark, tiny_transcripts_pdf, tmp_path):
    pq = str(tmp_path / "p.parquet")
    pdf = tiny_transcripts_pdf.copy()
    pdf.loc[pdf.index[:3], "text"] = None
    pdf.to_parquet(pq, index=False)
    cleaned = clean_turns(read_transcripts(spark, pq))
    assert cleaned.filter(F.col("text").isNull()).count() == 0
    assert cleaned.count() == len(pdf) - 3
    # the filter is relational → pushed into the parquet scan
    plan = cleaned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(text)" in plan


def test_stable_turn_order(spark, tiny_transcripts):
    ordered = stable_turn_order(tiny_transcripts, num_partitions=4)
    pdf = ordered.toPandas()
    # within each partition rows arrive sorted; globally per conv the
    # turn_idx sequence must be the full contiguous range
    g = pdf.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
