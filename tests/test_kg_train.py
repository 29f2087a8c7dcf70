"""KG-embedding training prep (operators.kg_train): dense entity
index, deterministic negative sampling (xxhash64 + md5 twins), and the
leakage-free fact split."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from duke_spark.operators.kg_train import (dense_entity_index,
                                           negative_samples,
                                           negative_samples_md5,
                                           split_facts)


@pytest.fixture()
def kg(spark):
    rows = [
        ("conv:1", "mentions", "ent:a"),
        ("conv:1", "mentions", "ent:b"),
        ("conv:2", "mentions", "ent:b"),   # duplicate fact occurrence
        ("conv:2", "mentions", "ent:b"),
        ("ent:a", "co_mentioned", "ent:b"),
        ("ent:b", "used_tool", "tool:t"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"]))


def _md5_48(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[16:28], 16)


def test_dense_index_is_sorted_rank(spark):
    ents = spark.createDataFrame(
        pd.DataFrame({"entity": ["c", "a", "b", "a", "d"]}))
    got = {r.entity: r.idx
           for r in dense_entity_index(ents).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_dense_index_partition_invariance(spark):
    vals = [f"e{i:03d}" for i in range(97)]
    import random
    random.Random(3).shuffle(vals)
    ents = spark.createDataFrame(pd.DataFrame({"entity": vals}))
    a = sorted(map(tuple, dense_entity_index(
        ents.repartition(1)).collect()))
    b = sorted(map(tuple, dense_entity_index(
        ents.repartition(17)).collect()))
    assert a == b
    assert [t[1] for t in a] == list(range(97))


def test_md5_negatives_match_python_formula(spark, kg):
    """Every sampled negative equals the hand-computed hash→rank→pool
    lookup; duplicate fact occurrences yield ONE sample set."""
    got = negative_samples_md5(kg, k=2).toPandas()
    pool = sorted({r.obj for r in kg.select("obj").distinct().collect()})
    facts = {(r.subj, r.pred, r.obj)
             for r in kg.select("subj", "pred", "obj").collect()}
    assert len(got) == len(facts) * 2
    for row in got.itertuples(index=False):
        key = f"{row.subj}|{row.pred}|{row.obj}|{row.neg_j}"
        want = pool[_md5_48(key) % len(pool)]
        assert row.neg_obj == want, key
        assert row.is_false_neg == (
            (row.subj, row.pred, want) in facts), key


def test_xxhash_negatives_deterministic_and_flagged(spark, kg):
    a = negative_samples(kg, k=3).toPandas().sort_values(
        ["subj", "pred", "obj", "neg_j"]).reset_index(drop=True)
    b = negative_samples(kg.repartition(7), k=3).toPandas().sort_values(
        ["subj", "pred", "obj", "neg_j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    facts = {(r.subj, r.pred, r.obj) for r in kg.collect()}
    for row in a.itertuples(index=False):
        assert row.is_false_neg == (
            (row.subj, row.pred, row.neg_obj) in facts)


def test_custom_entity_pool(spark, kg):
    pool = spark.createDataFrame(
        pd.DataFrame({"entity": ["ent:a", "ent:b", "ent:z"]}))
    got = negative_samples_md5(kg, k=2, entity_pool=pool).toPandas()
    assert set(got["neg_obj"]) <= {"ent:a", "ent:b", "ent:z"}


def test_split_is_leakage_free_and_deterministic(spark):
    rows = [(f"s{i % 50}", "p", f"o{i % 37}") for i in range(400)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    got = split_facts(df, train=80, valid=10).toPandas()
    # distinct facts only, one label each
    assert len(got) == len(got.drop_duplicates(["subj", "pred", "obj"]))
    # deterministic under repartition
    got2 = split_facts(df.repartition(13)).toPandas()
    m = got.merge(got2, on=["subj", "pred", "obj"])
    assert (m["split_x"] == m["split_y"]).all()
    # roughly the requested proportions (hash split, small-n tolerance)
    frac = got["split"].value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.95
    assert set(frac.index) <= {"train", "valid", "test"}


def test_split_bad_weights_raise(spark, kg):
    with pytest.raises(ValueError):
        split_facts(kg, train=95, valid=10)


def test_bad_k_raises(spark, kg):
    with pytest.raises(ValueError, match="k must be"):
        negative_samples_md5(kg, k=0)


def test_empty_pool_raises(spark, kg):
    empty = kg.select(F.col("obj").alias("entity")).limit(0)
    with pytest.raises(ValueError, match="empty entity pool"):
        negative_samples_md5(kg, k=1, entity_pool=empty)
