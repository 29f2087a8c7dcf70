"""Gap-based sessionization tests."""

import pandas as pd

from duke_spark.operators.sessions import session_stats, sessionize


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
