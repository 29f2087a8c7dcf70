"""BPE tokenizer (operators/bpe.py): classic merge order on a textbook
corpus, trainer/encoder agreement, reference-Python count parity,
round-trip invariant, merge persistence."""

import numpy as np
import pandas as pd
import pytest

from duke_spark.operators.bpe import (EOW, apply_bpe, encode_word,
                                      load_merges, save_merges, train_bpe)


def test_textbook_merge_order(spark):
    """The classic BPE example: 'low'×5 'lower'×2 'newest'×6 'widest'×3.
    First merges must pick the most frequent pairs: ('e','s') count 9,
    then ('es','t') 9, ('est','</w>') 9 …"""
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "text": [" ".join(words)]}))
    merges = train_bpe(df, num_merges=5)
    assert merges[0] == ["e", "s"]
    assert merges[1] == ["es", "t"]
    assert merges[2] == ["est", EOW]
    assert merges[3] == ["l", "o"]
    assert merges[4] == ["lo", "w"]


def test_encode_word_uses_rank_order():
    merges = [["e", "s"], ["es", "t"], ["est", EOW], ["l", "o"],
              ["lo", "w"]]
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("low", ranks) == ["low", EOW]
    assert encode_word("xyz", ranks) == ["x", "y", "z", EOW]


def test_roundtrip_invariant():
    """Concatenated tokens (minus the EOW marker) always reproduce the
    word — for any merge table."""
    rng = np.random.default_rng(3)
    merges = [["a", "b"], ["ab", "c"], ["d", EOW], ["e", "d</w>"]]
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    alphabet = list("abcdef")
    for _ in range(200):
        w = "".join(rng.choice(alphabet, rng.integers(1, 9)))
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(EOW, "") == w


def test_apply_bpe_matches_reference_counts(spark):
    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta", "alphabet", "better",
             "gamble", "dell"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(80)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(80, dtype="int64"), "text": texts}))
    merges = train_bpe(df, num_merges=40)
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    got = apply_bpe(df, merges).toPandas().set_index("doc_id")
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        exp = sum(len(encode_word(w, ranks)) for w in words)
        assert got.loc[i, "n_bpe_tokens"] == exp, i
        assert got.loc[i, "n_words"] == len(words), i
    # learned merges genuinely compress: fewer tokens than chars
    n_chars = sum(len(w) for t in texts for w in t.split(" ") if w)
    assert 0 < got["n_bpe_tokens"].sum() < n_chars


def test_merge_persistence(tmp_path):
    merges = [["a", "b"], ["ab", EOW]]
    p = str(tmp_path / "merges.json")
    save_merges(merges, p)
    assert load_merges(p) == merges


def test_apply_bpe_string_id_column(spark):
    """apply_bpe must respect the id column's actual dtype (ADVICE r3):
    a string doc id used to fail at Arrow conversion because the output
    schema hardcoded LongType."""
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": ["low lower lowest", "new newer newest"]}))
    merges = train_bpe(df, num_merges=10)
    got = apply_bpe(df, merges).toPandas().set_index("doc_id")
    assert set(got.index) == {"a", "b"}
    assert (got["n_words"] == 3).all()
