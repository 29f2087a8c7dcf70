"""Bucketed co-located joins: correctness + the no-Exchange plan shape."""

import contextlib
import io

import pandas as pd
import pytest

from duke_spark.plans.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(200), dtype="int64"),
        "text": [f"doc {i}" for i in range(200)],
    }))
    feats = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(0, 200, 2), dtype="int64"),
        "score": [i * 0.5 for i in range(100)],
    }))
    write_bucketed(docs, "b_docs", "doc_id", num_buckets=8,
                   sort_cols=["doc_id"])
    write_bucketed(feats, "b_feats", "doc_id", num_buckets=8,
                   sort_cols=["doc_id"])
    yield "b_docs", "b_feats"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_feats")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    """With broadcast off (both sides 'large', as at 100 TB) the join
    must use the bucket layout: SortMergeJoin with NO Exchange."""
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, on="doc_id")
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # co-located: neither side re-shuffles on the join key
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (bucketed_join(spark, left, right, on="doc_id").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (spark.table(left).join(spark.table(right).hint("shuffle_hash"),
                                  "doc_id").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns])
    assert len(got) == 100
