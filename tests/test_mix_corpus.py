"""Token-budget domain mixing (jobs/mix_corpus.py): water-filling math,
sampling determinism under repartitioning, achieved-share tolerance."""

import numpy as np
import pandas as pd
import pytest

from jobs.mix_corpus import water_fill


def test_water_fill_exact_when_plentiful():
    rates = water_fill({"a": 10_000, "b": 10_000}, {"a": 0.5, "b": 0.5},
                       budget=10_000)
    assert rates == {"a": 0.5, "b": 0.5}


def test_water_fill_redistributes_stranded_budget():
    # a can only supply 1435 of its 1800-token target; the stranded 365
    # flows to b and c in 3:1 weight proportion
    rates = water_fill({"a": 1435, "b": 1540, "c": 1407},
                       {"a": 0.6, "b": 0.3, "c": 0.1}, budget=3000)
    assert rates["a"] == 1.0
    assert rates["b"] == pytest.approx((3000 - 1435) * 0.75 / 1540, 1e-9)
    assert rates["c"] == pytest.approx((3000 - 1435) * 0.25 / 1407, 1e-9)


def test_water_fill_caps_at_corpus_size():
    rates = water_fill({"a": 100, "b": 100}, {"a": 0.5, "b": 0.5},
                       budget=10_000)
    assert rates == {"a": 1.0, "b": 1.0}     # take everything, no more


def test_water_fill_missing_source_gets_zero():
    rates = water_fill({"a": 1000}, {"a": 0.5, "b": 0.5}, budget=500)
    assert rates["b"] == 0.0 and 0 < rates["a"] <= 1.0


@pytest.fixture(scope="module")
def mix_docs(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(3000):
        src = f"s{i % 3}"
        rows.append((i, src, " ".join(
            rng.choice(["tok"], rng.integers(5, 15)))))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


def test_mix_is_partition_invariant_and_on_target(spark, mix_docs):
    from pyspark.sql import functions as F

    from duke_spark.operators.sampling import stratified_sample
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    avail = {r["source"]: int(r["toks"])
             for r in mix_docs.groupBy("source")
             .agg(F.sum(n_tok).alias("toks")).collect()}
    weights = {"s0": 0.5, "s1": 0.35, "s2": 0.15}
    budget = int(sum(avail.values()) * 0.4)
    rates = water_fill(avail, weights, budget)

    a = stratified_sample(mix_docs, rates, salt="mix") \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(mix_docs.repartition(17), rates, salt="mix") \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)       # hash filter, not RNG

    got = a.assign(t=a["text"].str.split(" ").str.len()) \
        .groupby("source")["t"].sum()
    total = got.sum()
    assert total == pytest.approx(budget, rel=0.1)
    for s, w in weights.items():
        assert got[s] / total == pytest.approx(w, abs=0.05), s
