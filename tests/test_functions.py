"""Column-function namespace: each helper behaves as its operator twin."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import duke_spark.functions as dsf


def test_cents_exact(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [0.01, 12.34, 999.99, 0.0]}))
    got = df.select(dsf.cents("x").alias("c")).toPandas()["c"].tolist()
    assert got == [1, 1234, 99999, 0]


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["hello world", "a1b2!", ""]}))
    got = df.select(dsf.bpe_token_count("t").alias("n")) \
        .toPandas()["n"].tolist()
    # "hello"," world" → 2; "a","1","b","2","!" → 5; "" → 0
    assert got == [2, 5, 0]


def test_normalized_text(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["  a   b\tc  "]}))
    assert df.select(dsf.normalized_text("t").alias("n")) \
        .head()["n"] == "a b c"


def test_stopword_ratio(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["the cat is here"]}))
    r = df.select(dsf.stopword_ratio("t").alias("r")).head()["r"]
    assert abs(r - 0.5) < 1e-12  # "the", "is" of 4


def test_cosine_to_matches_numpy(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((5, 8))
    q = rng.standard_normal(8)
    pdf = pd.DataFrame({"v": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    got = df.select(dsf.cosine_to("v", q).alias("c")).toPandas()["c"]
    exp = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_approx_count_distinct_tracks_exact(spark):
    """HLL sketch cardinality (the 10^12-row path) lands within its rsd
    bound of exact countDistinct."""
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({
        "g": ["a"] * 5000 + ["b"] * 5000,
        "u": list(range(1000)) * 5 + list(range(300)) * 10
        + list(range(2000, 4000)),
    }))
    got = (df.groupBy("g")
           .agg(F.countDistinct("u").alias("exact"),
                F.approx_count_distinct("u", 0.02).alias("approx"))
           .toPandas().set_index("g"))
    for g in ("a", "b"):
        exact, approx = got.loc[g, "exact"], got.loc[g, "approx"]
        assert abs(approx - exact) / exact < 0.06   # 3x rsd margin
