"""Corpus-prep operators (chunking, PII scrub, repetition scores):
reference-Python parity, coverage/overlap invariants, plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from duke_spark.operators.corpus_prep import (PII_PATTERNS,
                                              chunk_documents,
                                              repetition_scores,
                                              scrub_pii)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 400)))
             for _ in range(50)] + ["single", ""]
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"), "text": texts}))


def test_chunking_matches_reference(spark, docs):
    got = chunk_documents(docs, chunk_words=128, overlap=16).toPandas()
    src = docs.toPandas().set_index("doc_id")["text"]
    step = 112
    for doc_id, grp in got.groupby("doc_id"):
        words = src[doc_id].split(" ")
        n_chunks = max(-(-(len(words) - 16) // step), 1)
        grp = grp.sort_values("chunk_idx")
        assert list(grp["chunk_idx"]) == list(range(n_chunks))
        for i, row in zip(range(n_chunks), grp.itertuples()):
            exp = words[i * step:i * step + 128]
            assert row.chunk_text == " ".join(exp)
            assert row.n_words == len(exp)
    # coverage: concatenating chunks minus overlaps reproduces the doc
    assert set(got["doc_id"]) == set(src.index)


def test_chunking_overlap_invariant(spark, docs):
    got = chunk_documents(docs, chunk_words=64, overlap=8).toPandas()
    for _, grp in got.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        prev = None
        for row in grp.itertuples():
            if prev is not None and row.n_words > 0:
                assert prev.chunk_text.split(" ")[56:] == \
                    row.chunk_text.split(" ")[:prev.n_words - 56]
            prev = row
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_words=32, overlap=32)


def test_scrub_pii_masks_and_preserves(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": [
        "mail me at jane.doe+x@corp.example.com or call +1 (555) 010-9999",
        "server 192.168.10.250 responded, ssn 123-45-6789 leaked",
        "clean text with no identifiers at all",
        "version 1.2.3.4.5 is not an ip but 10.0.0.1 is",
    ]}))
    got = scrub_pii(df).toPandas()["scrubbed_text"]
    assert "<EMAIL>" in got[0] and "jane" not in got[0]
    assert "<PHONE>" in got[0]
    assert "<IP>" in got[1] and "<SSN>" in got[1]
    assert got[2] == "clean text with no identifiers at all"
    assert "<IP>" in got[3]


def test_repetition_scores_reference(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": [
        "a b c a b c a b c",      # 7 trigrams, 3 distinct -> 4/7
        "a b c d e",              # all distinct -> 0
        "x y",                    # shorter than ngram -> 0
        "",
    ]}))
    got = repetition_scores(df).toPandas()
    assert got.loc[0, "rep_ratio"] == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert got.loc[0, "n_ngrams"] == 7
    assert got.loc[1, "rep_ratio"] == 0.0
    assert got.loc[2, "rep_ratio"] == 0.0 and got.loc[2, "n_ngrams"] == 0
    assert got.loc[3, "rep_ratio"] == 0.0


def test_plans_are_narrow(spark, docs):
    for out in (chunk_documents(docs), scrub_pii(docs),
                repetition_scores(docs)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan
