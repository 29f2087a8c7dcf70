"""Triple-pattern matching (operators.pattern): binding semantics,
join-order invariance, repeated variables, set semantics, and the
disconnected-pattern guard."""

import pandas as pd
import pytest

from duke_spark.operators.pattern import match_pattern


@pytest.fixture()
def kg(spark):
    rows = [
        ("conv:1", "mentions", "ent:a"),
        ("conv:1", "mentions", "ent:b"),
        ("conv:2", "mentions", "ent:b"),
        ("ent:a", "co_mentioned", "ent:b"),
        ("ent:b", "co_mentioned", "ent:c"),
        ("ent:a", "used_tool", "tool:t"),
        ("ent:a", "used_tool", "tool:t"),   # duplicate triple
        ("ent:x", "likes", "ent:x"),        # self-loop
        ("ent:y", "likes", "ent:z"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"]))


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_single_element_constant_pred(kg):
    out = match_pattern(kg, [("?s", "mentions", "?o")])
    assert sorted(out.columns) == ["o", "s"]
    assert _rows(out.select("s", "o")) == {
        ("conv:1", "ent:a"), ("conv:1", "ent:b"), ("conv:2", "ent:b")}


def test_chain_join(kg):
    out = match_pattern(kg, [("?conv", "mentions", "?e1"),
                             ("?e1", "co_mentioned", "?e2")])
    assert out.columns == ["conv", "e1", "e2"]
    assert _rows(out) == {("conv:1", "ent:a", "ent:b"),
                          ("conv:1", "ent:b", "ent:c"),
                          ("conv:2", "ent:b", "ent:c")}


def test_join_order_invariance(kg):
    """Reversing the pattern (so the selectivity reorder actually has
    to act) gives identical bindings."""
    p = [("?conv", "mentions", "?e1"),
         ("?e1", "used_tool", "?t")]
    assert _rows(match_pattern(kg, p)) == \
        _rows(match_pattern(kg, list(reversed(p))))
    assert _rows(match_pattern(kg, p)) == {("conv:1", "ent:a", "tool:t")}


def test_constant_subject_anchors(kg):
    out = match_pattern(kg, [("conv:2", "mentions", "?e")])
    assert _rows(out) == {("ent:b",)}


def test_repeated_var_within_element(kg):
    out = match_pattern(kg, [("?x", "likes", "?x")])
    assert _rows(out) == {("ent:x",)}


def test_duplicate_triples_set_semantics(kg):
    out = match_pattern(kg, [("?e", "used_tool", "?t")])
    assert _rows(out) == {("ent:a", "tool:t")}


def test_triangle_pattern(kg):
    """Three-element pattern sharing vars pairwise."""
    out = match_pattern(kg, [("?conv", "mentions", "?a"),
                             ("?a", "co_mentioned", "?b"),
                             ("?conv", "mentions", "?b")])
    assert out.columns == ["a", "b", "conv"]
    assert _rows(out) == {("ent:a", "ent:b", "conv:1")}


def test_disconnected_pattern_raises(kg):
    with pytest.raises(ValueError, match="disconnected"):
        match_pattern(kg, [("?a", "mentions", "?b"),
                           ("?c", "likes", "?d")])


def test_no_variable_element_raises(kg):
    with pytest.raises(ValueError, match="binds no variable"):
        match_pattern(kg, [("conv:1", "mentions", "ent:a")])


def test_empty_pattern_raises(kg):
    with pytest.raises(ValueError, match="empty pattern"):
        match_pattern(kg, [])
