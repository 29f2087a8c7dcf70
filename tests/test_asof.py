"""As-of join (operators/asof.py): pandas merge_asof parity across
directions/tolerance/groups, inclusive-tie semantics, single-shuffle
plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from duke_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "ts": rng.integers(0, 1000, 200).astype("int64"),
        "lv": np.arange(200, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 80),
        "ts": rng.integers(0, 1000, 80).astype("int64"),
        "rv": np.arange(1000, 1080, dtype="int64"),
    }).drop_duplicates(["k", "ts"])          # asof determinism requirement
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(
            columns={"ts": "ts_matched"}),
        left_on="ts", right_on="ts_matched", by="k",
        direction=direction, tolerance=tolerance)
    return out.sort_values(["k", "ts", "lv"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(spark, frames, direction):
    left, right = frames
    got = (asof_join(spark.createDataFrame(left),
                     spark.createDataFrame(right),
                     on="ts", by=["k"], direction=direction)
           .toPandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True))
    exp = _pandas_asof(left, right, direction)
    for col in ("rv", "ts_matched"):
        pd.testing.assert_series_equal(
            got[col].astype("float64"), exp[col].astype("float64"),
            check_names=False)


def test_tolerance_nulls_far_matches(spark, frames):
    left, right = frames
    got = (asof_join(spark.createDataFrame(left),
                     spark.createDataFrame(right),
                     on="ts", by=["k"], tolerance=50)
           .toPandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True))
    exp = _pandas_asof(left, right, "backward", tolerance=50)
    pd.testing.assert_series_equal(got["rv"].astype("float64"),
                                   exp["rv"].astype("float64"),
                                   check_names=False)
    # tolerance must strictly reduce (or keep) the match count
    full = asof_join(spark.createDataFrame(left),
                     spark.createDataFrame(right), on="ts", by=["k"])
    assert (got["rv"].notna().sum()
            < full.toPandas()["rv"].notna().sum())


def test_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "ts": [100], "lv": [1]}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "ts": [100], "rv": [7]}))
    got = asof_join(left, right, on="ts", by=["k"]).toPandas()
    assert got.loc[0, "rv"] == 7            # right row at SAME ts matches
    fwd = asof_join(left, right, on="ts", by=["k"],
                    direction="forward").toPandas()
    assert fwd.loc[0, "rv"] == 7


def test_timestamp_on_column_and_overlap_error(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime(
            ["2026-01-01 00:00:05", "2026-01-01 00:00:01"]),
            "lv": [1, 2]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime(
            ["2026-01-01 00:00:03"]), "rv": [9]}))
    got = (asof_join(left, right, on="ts", by=["k"])
           .toPandas().set_index("lv"))
    assert got.loc[1, "rv"] == 9 and pd.isna(got.loc[2, "rv"])
    # 1-second tolerance (µs units for timestamps) nulls the 2 s gap
    tol = (asof_join(left, right, on="ts", by=["k"], tolerance=1_000_000)
           .toPandas().set_index("lv"))
    assert pd.isna(tol.loc[1, "rv"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, left.withColumnRenamed("k", "k2"), on="ts")


def test_single_shuffle_plan(spark, frames):
    left, right = frames
    out = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right), on="ts", by=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partition exchange for the window (the union's two inputs
    # share it), and no join node at all — the asof is window-only
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_property_random_frames_match_pandas(spark):
    """Hypothesis-style randomized sweep (seeded, no flake): many small
    random frames across directions — Spark asof == pandas merge_asof."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        nl, nr = rng.integers(1, 40, 2)
        left = pd.DataFrame({
            "k": rng.integers(0, 3, nl),
            "ts": rng.integers(0, 60, nl).astype("int64"),
            "lv": np.arange(nl, dtype="int64")})
        right = pd.DataFrame({
            "k": rng.integers(0, 3, nr),
            "ts": rng.integers(0, 60, nr).astype("int64"),
            "rv": np.arange(100, 100 + nr, dtype="int64")
        }).drop_duplicates(["k", "ts"])
        for direction in ("backward", "forward"):
            got = (asof_join(spark.createDataFrame(left),
                             spark.createDataFrame(right),
                             on="ts", by=["k"], direction=direction)
                   .toPandas().sort_values(["k", "ts", "lv"])
                   .reset_index(drop=True))
            exp = pd.merge_asof(
                left.sort_values("ts", kind="stable"),
                right.sort_values("ts", kind="stable").rename(
                    columns={"ts": "ts_matched"}),
                left_on="ts", right_on="ts_matched", by="k",
                direction=direction).sort_values(["k", "ts", "lv"]) \
                .reset_index(drop=True)
            pd.testing.assert_series_equal(
                got["rv"].astype("float64"), exp["rv"].astype("float64"),
                check_names=False), (trial, direction)


def test_empty_right_yields_all_null_matches(spark):
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 2], "ts": [5, 6], "lv": [0, 1]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [1], "rv": [9]})).filter("k > 99")
    got = asof_join(left, right, on="ts", by=["k"]).toPandas()
    assert len(got) == 2 and got["rv"].isna().all()


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_null_payload_field_is_not_backfilled(spark, direction):
    """The matched right row must be taken ATOMICALLY (ADVICE r3): a NULL
    payload field in the true match stays NULL instead of being carried
    from an older/newer right row — multi-column payload, per-column
    last/first(ignorenulls) would mix rows here."""
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1, 1], "ts": [10, 20], "lv": [0, 1]}))
    right_pdf = pd.DataFrame({
        "k": [1, 1, 1],
        "ts": [5, 15, 25],
        "rv": [100.0, None, 200.0],       # null at the ts=15 / ts=25 match
        "rw": [None, 300.0, None],
    })
    if direction == "forward":
        right_pdf.loc[2, "rv"] = None
        right_pdf.loc[2, "rw"] = 400.0
    right = spark.createDataFrame(right_pdf)
    got = (asof_join(left, right, on="ts", by=["k"], direction=direction)
           .toPandas().sort_values("ts").reset_index(drop=True))
    exp = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right_pdf.sort_values("ts").rename(columns={"ts": "ts_matched"}),
        left_on="ts", right_on="ts_matched", by="k", direction=direction
    ).sort_values("ts").reset_index(drop=True)
    for col in ("rv", "rw", "ts_matched"):
        pd.testing.assert_series_equal(got[col].astype("float64"),
                                       exp[col].astype("float64"),
                                       check_names=False)
