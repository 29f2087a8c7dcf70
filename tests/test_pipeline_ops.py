"""Training-pipeline operators added in round 2: unigram log-loss,
deterministic stratified sampling, benchmark contamination."""

import math

import numpy as np
import pandas as pd
import pytest

from duke_spark.operators.contamination import contamination_flags
from duke_spark.operators.sampling import (deterministic_sample,
                                           md5_threshold, stratified_sample)
from duke_spark.operators.text_analysis import unigram_logloss


def test_unigram_logloss_matches_reference(spark):
    texts = ["a a b", "a c", "b b b c"]
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(3), dtype="int64"), "text": texts}))
    got = (unigram_logloss(docs).toPandas()
           .set_index("doc_id").sort_index())
    # corpus counts: a=3, b=4, c=2, total=9
    cnt = {"a": 3, "b": 4, "c": 2}
    total = 9
    for i, t in enumerate(texts):
        ws = t.split(" ")
        exp = np.mean([-math.log(cnt[w] / total) for w in ws])
        assert got.loc[i, "logloss"] == pytest.approx(exp, abs=1e-6)
        assert got.loc[i, "n_words"] == len(ws)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(2000), dtype="int64"),
        "source": [f"s{i % 2}" for i in range(2000)],
    }))


def test_deterministic_sample_properties(spark, keyed):
    half = deterministic_sample(keyed, 0.5)
    n = half.count()
    assert 0.4 * 2000 < n < 0.6 * 2000          # unbiased-ish
    # partition-count invariant (df.sample is NOT)
    ids_a = set(r["doc_id"] for r in half.collect())
    ids_b = set(r["doc_id"] for r in
                deterministic_sample(keyed.repartition(7), 0.5).collect())
    assert ids_a == ids_b
    # nested thresholds → monotone samples: sample(0.2) ⊆ sample(0.5)
    ids_small = set(r["doc_id"] for r in
                    deterministic_sample(keyed, 0.2).collect())
    assert ids_small <= ids_a
    assert deterministic_sample(keyed, 1.0).count() == 2000
    assert deterministic_sample(keyed, 0.0).count() == 0


def test_stratified_rates(spark, keyed):
    kept = stratified_sample(keyed, {"s0": 1.0, "s1": 0.25}).toPandas()
    by = kept.groupby("source").size()
    assert by["s0"] == 1000
    assert 0.15 * 1000 < by.get("s1", 0) < 0.35 * 1000
    # strata not in the rate map are dropped
    none = stratified_sample(keyed, {"s0": 0.5}).toPandas()
    assert set(none["source"]) == {"s0"}


def test_md5_threshold_bounds():
    assert md5_threshold(0.0) == "0" * 32
    assert len(md5_threshold(0.999999)) == 32
    assert md5_threshold(0.5)[0] == "8"
    # frac >= 1.0 never reaches the threshold comparison (samplers
    # short-circuit to keep-all), so only [0, 1) must order correctly
    assert md5_threshold(0.25) < md5_threshold(0.5) < md5_threshold(0.99)


def test_contamination_flags(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(3), dtype="int64"),
        "text": ["the secret benchmark answer is here",
                 "completely unrelated text about rivers",
                 "short"],
    }))
    out = (contamination_flags(docs, ["the secret benchmark answer",
                                      "short"])
           .toPandas().set_index("doc_id").sort_index())
    assert bool(out.loc[0, "contaminated"])     # shares 3-gram shingles
    assert out.loc[0, "n_overlap"] == 2         # 2 of the 2 bench 3-grams
    assert not bool(out.loc[1, "contaminated"])
    assert bool(out.loc[2, "contaminated"])     # whole-text shingle match
