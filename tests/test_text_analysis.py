"""Text-analysis operator tests: token counting, quality, lang-id,
fingerprinting."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from duke_spark.operators.text_analysis import (doc_fingerprint, language_id,
                                                quality_scores, token_count)

DOCS = [
    (0, "the quick brown fox and the lazy dog"),
    (1, "der hund und die katze ist ein tier"),
    (2, "xyzzy plugh qwfp"),
    (3, "Hello, World! THIS is A test."),
    (4, "the  the  the"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS,
                                              columns=["doc_id", "text"]))


def test_token_count(spark, docs):
    out = token_count(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 8
    assert out.loc[0, "n_chars_actual"] == len(DOCS[0][1])
    assert out.loc[0, "n_subword_est"] == -(-len(DOCS[0][1]) // 4)


def test_quality_scores(spark, docs):
    out = quality_scores(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "stopword_ratio"] == pytest.approx(3 / 8)  # the,and,the
    assert out.loc[2, "stopword_ratio"] == 0.0
    assert out.loc[3, "punct_ratio"] > 0
    assert out.loc[3, "upper_ratio"] > 0
    assert out.loc[0, "punct_ratio"] == 0.0


def test_language_id(spark, docs):
    out = language_id(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "de"
    assert out.loc[2, "lang_pred"] == "und"


def test_doc_fingerprint_whitespace_invariant(spark, docs):
    out = doc_fingerprint(docs).toPandas().set_index("doc_id")
    extra = spark.createDataFrame(
        pd.DataFrame([(9, "  the quick brown fox and the lazy   dog ")],
                     columns=["doc_id", "text"]))
    fp9 = doc_fingerprint(extra).toPandas()["fingerprint"].iloc[0]
    assert fp9 == out.loc[0, "fingerprint"]
    assert out["fingerprint"].nunique() == len(out)
