"""Adversarial inputs through the full pipeline: nulls, unicode, empty
and whitespace-only turns, very long turns, duplicate (conv, turn) keys —
the pipeline must neither crash nor diverge from the oracle."""

import numpy as np
import pandas as pd
import pytest

from duke_spark.fixtures.transcripts import spark_transcripts
from duke_spark.kernel.oracle import oracle_triples, triple_prf
from duke_spark.operators.triples import extract_triples


@pytest.fixture(scope="module")
def nasty_pdf():
    rows = [
        ("c0", 0, "user", "agent plays baseball", None),
        ("c0", 1, "assistant", "", None),                      # empty
        ("c0", 2, "tool", "   ", "search"),                    # whitespace
        ("c0", 3, "user", None, None),                         # null text
        ("c1", 0, "user", "züge sind schnell 火车很快", None),   # unicode OOV
        ("c1", 1, "assistant", "team agent team agent " * 500, None),  # long
        ("c1", 2, "tool", "BirdWatcher-2000 (prototype)", "browser"),
        ("c2", 0, "user", "zzyzx qwfp blorptex", None),        # all-OOV
        ("c2", 1, "user", "coach", None),                      # single token
        ("c3", 0, None, "artist wrote song", None),            # null role
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.Timestamp("2026-01-01").as_unit("us")
    return pdf


def test_nasty_inputs_match_oracle(spark, ctx_bc, oracle_ctx, nasty_pdf):
    df = spark_transcripts(spark, nasty_pdf).repartition(3)
    got = extract_triples(df, ctx_bc).toPandas()
    exp = oracle_triples(oracle_ctx, nasty_pdf.dropna(subset=["text"]))
    prf = triple_prf(exp, got)
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0, prf
    # all-OOV and empty turns contribute nothing
    assert not (got["conv_id"] == "c2").any() or \
        set(got[got["conv_id"] == "c2"]["turn_idx"]) == {1}


def test_long_turn_mentions_capped_by_chunking(spark, ctx_bc, nasty_pdf):
    from duke_spark.operators.mentions import linked_mentions
    df = spark_transcripts(spark, nasty_pdf)
    m = linked_mentions(df, ctx_bc).toPandas()
    long_turn = m[(m["conv_id"] == "c1") & (m["turn_idx"] == 1)]
    # 2000 in-vocab tokens → ceil(2000/3) mentions, ids dense from 0
    assert len(long_turn) == int(np.ceil(2000 / 3))
    assert sorted(long_turn["mention_id"]) == list(range(len(long_turn)))


def test_empty_input(spark, ctx_bc):
    empty = spark_transcripts(
        spark, pd.DataFrame(columns=["conv_id", "turn_idx", "role", "text",
                                     "tool", "ts"]).astype(
            {"turn_idx": "int32", "ts": "datetime64[us]"}))
    assert extract_triples(empty, ctx_bc).count() == 0


def test_camel_dash_paren_normalization(spark, ctx_bc, nasty_pdf):
    """'BirdWatcher-2000 (prototype)' → underscore+replaces → tokens
    ['bird', 'watcher', '2000', 'prototype'] → only 'bird' is in vocab."""
    from duke_spark.operators.mentions import linked_mentions
    df = spark_transcripts(spark, nasty_pdf)
    m = linked_mentions(df, ctx_bc).toPandas()
    row = m[(m["conv_id"] == "c1") & (m["turn_idx"] == 2)]
    assert row["mention"].tolist() == ["bird"]
