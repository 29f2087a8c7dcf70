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


def test_md5_hash_convention_unicode_cross_engine(spark):
    """The Spark md5 word-hash paths (simhash_md5) must agree with
    DuckDB's md5_number_lower on non-ASCII text — both hash UTF-8 bytes,
    and the digest-tail/endianness convention must line up exactly."""
    import duckdb
    import hashlib
    from duke_spark.operators.dedup import simhash64_md5

    texts = ["héllo wörld", "naïve café", "日本語 テキスト", "emoji 🚀 text",
             "", "mixed ascii ünd ümlaut"]
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts}))
    got = dict(zip(*(lambda d: (d["doc_id"], d["simhash"]))(
        simhash64_md5(docs).toPandas())))

    con = duckdb.connect()
    for i, text in enumerate(texts):
        words = text.split(" ")
        # DuckDB's own md5_number_lower per word
        duck = [con.sql("SELECT md5_number_lower(?)", params=[w])
                .fetchone()[0] for w in words]
        ours = [int.from_bytes(hashlib.md5(w.encode()).digest()[8:],
                               "little") for w in words]
        assert duck == ours, text
        sig = 0
        for b in range(64):
            if sum((h >> b) & 1 for h in ours) * 2 >= len(ours):
                sig |= 1 << b
        assert got[i] == np.int64(np.uint64(sig)).item(), text


def test_near_dup_pair_ops_on_empty_and_single(spark):
    """Pair generators must return empty (not crash) on degenerate
    inputs: empty table, single row, all-identical bucket."""
    from pyspark.sql import types as T
    from duke_spark.operators.similarity import (cosine_near_dup_pairs,
                                                 embedding_near_dups)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    empty = spark.createDataFrame([], schema)
    assert cosine_near_dup_pairs(empty, num_planes=2).count() == 0
    assert embedding_near_dups(empty, dim=4, num_planes=2).count() == 0
    one = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])], schema)
    assert cosine_near_dup_pairs(one, num_planes=2).count() == 0
    same = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(5)], schema)
    # 10 identical pairs, cosine exactly 1.0
    out = cosine_near_dup_pairs(same, threshold=0.99,
                                num_planes=2).toPandas()
    assert len(out) == 10 and (out["cosine"] == 1.0).all()


def test_graph_analytics_on_empty_and_single(spark):
    """Degrees / two-hop / PMI degrade gracefully: empty inputs yield
    empty outputs with the right columns; a single mention yields no
    pairs but a valid marginal."""
    import pandas as pd
    from pyspark.sql import types as T

    from duke_spark.operators.graph import (degrees,
                                            entity_cooccurrence_pmi,
                                            two_hop_neighbors)

    edge_schema = T.StructType([T.StructField("src", T.StringType()),
                                T.StructField("dst", T.StringType())])
    empty_edges = spark.createDataFrame([], schema=edge_schema)
    d = degrees(empty_edges).toPandas()
    assert list(d.columns) == ["id", "out_deg", "in_deg", "degree"]
    assert len(d) == 0
    assert len(two_hop_neighbors(empty_edges).toPandas()) == 0

    tri_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("score", T.DoubleType())])
    empty_tri = spark.createDataFrame([], schema=tri_schema)
    p = entity_cooccurrence_pmi(empty_tri).toPandas()
    assert list(p.columns) == ["ent_a", "ent_b", "n_pairs", "pmi"]
    assert len(p) == 0

    single = spark.createDataFrame(
        pd.DataFrame([("c1", 0, "conv:c1", "mentions", "ent:x", 0.5)],
                     columns=["conv_id", "turn_idx", "subj", "pred",
                              "obj", "score"]), schema=tri_schema)
    assert len(entity_cooccurrence_pmi(single).toPandas()) == 0
