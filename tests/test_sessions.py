"""Gap-based sessionization tests."""

import pandas as pd

from duke_spark.operators.sessions import (session_stats,
                                           session_window_stats, sessionize)


def _events(spark):
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        # user 1: two sessions (40-min gap between idx 2 and 3)
        (1, base),
        (1, base + pd.Timedelta(minutes=10)),
        (1, base + pd.Timedelta(minutes=20)),
        (1, base + pd.Timedelta(minutes=60)),
        (1, base + pd.Timedelta(minutes=61)),
        # user 2: one event
        (2, base + pd.Timedelta(minutes=5)),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf)


def test_sessionize_breaks_on_gap(spark):
    out = (sessionize(_events(spark), gap_seconds=1800).toPandas()
           .sort_values(["user_id", "ts"]).reset_index(drop=True))
    assert out[out["user_id"] == 1]["session_idx"].tolist() == \
        [0, 0, 0, 1, 1]
    assert out[out["user_id"] == 2]["session_idx"].tolist() == [0]


def test_session_stats_rollup(spark):
    out = (session_stats(_events(spark), gap_seconds=1800).toPandas()
           .set_index(["user_id", "session_idx"]).sort_index())
    assert out.loc[(1, 0), "n_events"] == 3
    assert out.loc[(1, 0), "span_us"] == 20 * 60 * 1_000_000
    assert out.loc[(1, 1), "n_events"] == 2
    assert out.loc[(2, 0), "span_us"] == 0


def test_sessionize_partition_invariant(spark):
    df = _events(spark)
    a = (sessionize(df, gap_seconds=1800).toPandas()
         .sort_values(["user_id", "ts"]).reset_index(drop=True))
    b = (sessionize(df.repartition(5), gap_seconds=1800).toPandas()
         .sort_values(["user_id", "ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_session_window_matches_sessionize(spark):
    """Native session_window rollup == the lag-based sessionize rollup
    (same gap, non-boundary fixture)."""
    got = (session_window_stats(_events(spark), gap="30 minutes")
           .toPandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    exp = (session_stats(_events(spark), gap_seconds=1800).toPandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events", "session_start", "session_end"]],
        exp[["user_id", "n_events", "session_start", "session_end"]])


def test_session_window_streaming_parity(spark, tmp_path):
    """The same session_window code over a file stream (availableNow,
    watermark) produces the batch result."""
    import os
    from pyspark.sql import types as T

    pdf = (_events(spark).toPandas())
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir, exist_ok=True)
    pdf.to_parquet(in_dir + "/a.parquet", index=False)
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    def run():
        stream = (spark.readStream.schema(schema).parquet(in_dir)
                  .withWatermark("ts", "1 hour"))
        (session_window_stats(stream).writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ck)
         .outputMode("append")
         .trigger(availableNow=True).start().awaitTermination())

    run()
    # append-mode sessions flush only once the watermark passes their
    # end: a far-future sentinel event in a second batch advances it
    sentinel = pd.DataFrame({
        "user_id": pd.array([99], dtype="int64"),
        "ts": pd.Series([pdf["ts"].max() + pd.Timedelta(days=2)])
        .astype("datetime64[us]")})
    sentinel.to_parquet(in_dir + "/b.parquet", index=False)
    run()
    got = (spark.read.parquet(out_dir).toPandas()
           .query("user_id != 99")
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    exp = (session_window_stats(_events(spark)).toPandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns], exp)
