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


def test_length_percentiles_exact_and_approx(spark):
    import numpy as np
    import pandas as pd
    from duke_spark.operators.text_analysis import length_percentiles

    rng = np.random.default_rng(4)
    lengths = rng.integers(1, 200, 400)
    docs = spark.createDataFrame(pd.DataFrame({
        "source": ["s0"] * 400,
        "text": [" ".join(["w"] * int(n)) for n in lengths]}))
    exact = (length_percentiles(docs, exact=True).toPandas().iloc[0])
    # exact mode == numpy linear interpolation
    for p, col in [(0.5, "p5"), (0.9, "p9"), (0.99, "p99")]:
        assert exact[col] == pytest.approx(
            np.quantile(lengths.astype(float), p), abs=1e-9)
    # the sketch lands within rank-accuracy of exact
    approx = (length_percentiles(docs, exact=False, accuracy=10000)
              .toPandas().iloc[0])
    for col in ("p5", "p9", "p99"):
        assert abs(approx[col] - exact[col]) <= \
            np.ptp(lengths) * 0.05 + 2


def test_normalize_clean_unicode(spark):
    import pandas as pd
    from duke_spark.operators.text_analysis import normalize_clean

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(4), dtype="int64"),
        "text": ["café  double  spaced",     # decomposed é
                 "tabs\tand\ncontrol\x01chars\x7f here",
                 "  edges  ",
                 None],
    }))
    out = (normalize_clean(docs).toPandas()
           .set_index("doc_id")["clean_text"].sort_index())
    assert out[0] == "café double spaced"     # composed NFC é
    assert out[1] == "tabs and control chars here"
    assert out[2] == "edges"
    assert out[3] == ""


def test_tfidf_topk_matches_numpy_reference(spark, docs):
    """Scores and top-k cut pinned against a from-scratch Python
    recompute on the same corpus (raw tf × ln(N/df), 6dp, word
    tiebreak)."""
    import math

    from duke_spark.operators.text_analysis import tfidf_topk

    out = tfidf_topk(docs, k=2).toPandas()
    # reference: pure-Python recompute
    tf, dfreq = {}, {}
    for did, text in DOCS:
        for w in text.split(" "):
            if w:
                tf[(did, w)] = tf.get((did, w), 0) + 1
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    n_docs = len(DOCS)
    scored = [(did, w, c, dfreq[w],
               round(c * math.log(n_docs / dfreq[w]), 6))
              for (did, w), c in tf.items()]
    expect = {}
    for did in {d for d, _ in DOCS}:
        rows = sorted((r for r in scored if r[0] == did),
                      key=lambda r: (-r[4], r[1]))[:2]
        for rnk, r in enumerate(rows, 1):
            expect[(did, r[1])] = (r[2], r[3], r[4], rnk)
    got = {(r.doc_id, r.word): (r.tf, r.df, r.tfidf, r.rnk)
           for r in out.itertuples()}
    assert got == expect


def test_tfidf_topk_partition_invariance(spark, docs):
    from duke_spark.operators.text_analysis import tfidf_topk

    one = tfidf_topk(docs.coalesce(1), k=3).toPandas()
    many = tfidf_topk(docs.repartition(7), k=3).toPandas()
    key = ["doc_id", "word"]
    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True))
