"""Distributed tree fold == kernel (driver) fold, exactly."""

import numpy as np
import pandas as pd

from duke_spark.fixtures.class_tree import mini_tree
from duke_spark.kernel.tree import aggregate_tree_scores
from duke_spark.operators.tree_distributed import (
    aggregate_tree_scores_distributed, tree_heights)


def test_heights_mini_tree():
    t = mini_tree()
    h = tree_heights(t)
    assert h["player"] == 0 and h["device"] == 0
    assert h["athlete"] == 1
    assert h["person"] == 2
    assert h["agent"] == 3


def test_distributed_equals_kernel_fold(spark):
    t = mini_tree()
    classes = list(t.keys())
    rng = np.random.default_rng(11)
    scores = rng.uniform(0.01, 1.0, len(classes))

    exp = aggregate_tree_scores(classes, scores, t)

    sdf = spark.createDataFrame(
        pd.DataFrame({"class": classes, "score": scores}))
    got = (aggregate_tree_scores_distributed(spark, sdf, t)
           .toPandas().set_index("class")["agg_score"])
    for c, e in zip(classes, exp):
        assert got[c] == e, c  # exact: same float ops


def test_distributed_on_big_tree(spark):
    from duke_spark.fixtures.scale import big_tree
    t = big_tree(n_classes=200)
    classes = list(t.keys())
    rng = np.random.default_rng(5)
    scores = rng.uniform(0.01, 1.0, len(classes))
    exp = aggregate_tree_scores(classes, scores, t)
    sdf = spark.createDataFrame(
        pd.DataFrame({"class": classes, "score": scores}))
    got = (aggregate_tree_scores_distributed(spark, sdf, t)
           .toPandas().set_index("class")["agg_score"])
    assert len(got) == len(classes)
    np.testing.assert_allclose(
        got[classes].to_numpy(), exp, rtol=0, atol=0)
