"""Range join (operators/range_join.py): brute-force parity, bucket-edge
cases, bounded row growth, and the no-nested-loop plan shape."""

import numpy as np
import pandas as pd
import pytest

from duke_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "k": rng.integers(0, 4, 120),
        "ts": rng.integers(0, 500, 120).astype("int64"),
        "lid": np.arange(120, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 4, 150),
        "ts": rng.integers(0, 500, 150).astype("int64"),
        "rid": np.arange(1000, 1150, dtype="int64"),
    })
    return left, right


def _brute(left, right, lower, upper):
    m = left.merge(right, on="k", suffixes=("_l", "_r"))
    d = m["ts_r"] - m["ts_l"]
    out = m[(d >= lower) & (d <= upper)]
    return set(zip(out["lid"], out["rid"]))


@pytest.mark.parametrize("lower,upper", [(-50, 0), (0, 50), (-30, 30),
                                         (10, 25)])
def test_matches_bruteforce(spark, frames, lower, upper):
    left, right = frames
    got = (range_join(spark.createDataFrame(left),
                      spark.createDataFrame(right),
                      on="ts", by=["k"], lower=lower, upper=upper)
           .toPandas())
    assert set(zip(got["lid"], got["rid"])) == _brute(left, right,
                                                      lower, upper)
    # no duplicate pairs from the 2-bucket explode
    assert len(got) == len(got.drop_duplicates(["lid", "rid"]))


def test_bucket_edges_inclusive(spark):
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1] * 3, "ts": [100, 100, 100],
         "lid": pd.array([0, 1, 2], dtype="int64")}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": [1] * 4, "ts": [90, 100, 110, 111],
         "rid": pd.array([0, 1, 2, 3], dtype="int64")}))
    got = (range_join(left, right, on="ts", by=["k"], lower=-10, upper=10)
           .toPandas())
    matched = set(got[got["lid"] == 0]["rid"])
    assert matched == {0, 1, 2}            # both endpoints inclusive, 111 out


def test_timestamp_units_and_errors(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1], "ts": pd.to_datetime(["2026-01-01 10:00:00"]),
        "lid": pd.array([1], dtype="int64")}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1],
        "ts": pd.to_datetime(["2026-01-01 09:30:00",
                              "2026-01-01 08:00:00"]),
        "rid": pd.array([1, 2], dtype="int64")}))
    hour_us = 3_600_000_000
    got = range_join(left, right, on="ts", by=["k"],
                     lower=-hour_us, upper=0).toPandas()
    assert set(got["rid"]) == {1}          # 09:30 in-window, 08:00 not
    with pytest.raises(ValueError, match="upper"):
        range_join(left, right, on="ts", lower=5, upper=1)


def test_plan_has_no_nested_loop(spark, frames):
    left, right = frames
    out = range_join(spark.createDataFrame(left),
                     spark.createDataFrame(right),
                     on="ts", by=["k"], lower=-50, upper=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan                   # a real equi hash/sort join


def test_empty_sides(spark):
    left = spark.createDataFrame(pd.DataFrame(
        {"k": [1], "ts": [5], "lid": pd.array([0], dtype="int64")}))
    empty = left.filter("k > 99")
    assert range_join(left, empty.withColumnRenamed("lid", "rid"),
                      on="ts", by=["k"], lower=-5, upper=5).count() == 0
    assert range_join(empty, left.withColumnRenamed("lid", "rid"),
                      on="ts", by=["k"], lower=-5, upper=5).count() == 0
