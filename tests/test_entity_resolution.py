"""Embedding-based entity resolution (operators.entity_resolution):
merge-map correctness vs a hand-computed closure, totality, and the
graph rewrite."""

import numpy as np
import pandas as pd
import pytest

from duke_spark.operators.entity_resolution import (apply_entity_merge,
                                                    resolve_entities)

DIM = 8


@pytest.fixture()
def vectors(spark):
    """Three planted clusters of near-identical vectors plus isolated
    points. Cluster ids: {0,1,2}, {10,11}, {20,21,22}; isolates 30, 31."""
    rng = np.random.default_rng(42)
    rows = []

    def add(base_id, n, seed_vec):
        for j in range(n):
            v = seed_vec + rng.normal(0, 0.01, DIM)
            rows.append((base_id + j, [float(x) for x in v]))

    add(0, 3, rng.normal(0, 1, DIM))
    add(10, 2, rng.normal(0, 1, DIM))
    add(20, 3, rng.normal(0, 1, DIM))
    rows.append((30, [float(x) for x in rng.normal(0, 1, DIM)]))
    rows.append((31, [float(x) for x in rng.normal(0, 1, DIM)]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(pdf), pdf


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_merge_map_matches_python_closure(vectors):
    df, pdf = vectors
    got = {r.entity: r.canonical
           for r in resolve_entities(df, threshold=0.99,
                                     num_planes=0).collect()}
    # python oracle: full-pairs closure at the same threshold
    ids = pdf["vec_id"].tolist()
    vecs = dict(zip(pdf["vec_id"], pdf["embedding"]))
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j and _cos(vecs[i], vecs[j]) >= 0.99:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    want = {i: find(i) for i in ids}
    assert got == want
    # the planted clusters actually merged (test isn't vacuous)
    assert want[2] == 0 and want[11] == 10 and want[22] == 20
    assert want[30] == 30


def test_map_is_total_and_identity_for_isolates(vectors):
    df, pdf = vectors
    got = resolve_entities(df, threshold=0.999999,
                           num_planes=0).toPandas()
    assert len(got) == len(pdf)            # total over input
    # at an impossible threshold everyone maps to themselves
    near_one = resolve_entities(df, threshold=1.1, num_planes=0) \
        .toPandas()
    assert (near_one["entity"] == near_one["canonical"]).all()


def test_apply_entity_merge_rewrites_and_passes_through(spark):
    triples = spark.createDataFrame(pd.DataFrame(
        [(2, "p", 11), (30, "p", 2), (5, "q", 5)],
        columns=["subj", "pred", "obj"]))
    mm = spark.createDataFrame(pd.DataFrame(
        [(2, 0), (11, 10), (30, 30)], columns=["entity", "canonical"]))
    got = {(r.subj, r.pred, r.obj)
           for r in apply_entity_merge(triples, mm).collect()}
    # 2→0, 11→10; 5 absent from the map passes through
    assert got == {(0, "p", 10), (30, "p", 0), (5, "q", 5)}


def test_resolve_kg_entities_merges_planted_aliases(spark):
    """Pipeline form: a context whose vocab contains two near-identical
    vectors ('acme' / 'acmecorp') merges those entities in the triple
    store; out-of-vocab and dissimilar entities pass through."""
    from duke_spark.fixtures.class_tree import mini_tree
    from duke_spark.operators.entity_resolution import resolve_kg_entities
    from duke_spark.operators.linking import LinkContext

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, DIM)
    words, vecs = [], []
    for w, v in [("acme", base), ("acmecorp", base + 0.001),
                 ("zebra", rng.normal(0, 1, DIM)),
                 ("agent", rng.normal(0, 1, DIM)),
                 ("team", rng.normal(0, 1, DIM))]:
        words.append(w)
        vecs.append(v)
    # mini_tree classes must embed; add their words with random vecs
    for w in {w for c in mini_tree() for w in c.split(" ")}:
        if w not in words:
            words.append(w)
            vecs.append(rng.normal(0, 1, DIM))
    ctx = LinkContext(words, np.asarray(vecs, dtype=np.float32),
                      mini_tree())
    ctx_bc = spark.sparkContext.broadcast(ctx)

    triples = spark.createDataFrame(pd.DataFrame(
        [("conv:1", "mentions", "ent:acme"),
         ("conv:2", "mentions", "ent:acmecorp"),
         ("conv:1", "mentions", "ent:zebra"),
         ("ent:acmecorp", "co_mentioned", "ent:zebra"),
         ("conv:3", "mentions", "ent:notinvocab")],
        columns=["subj", "pred", "obj"]))
    mm, resolved = resolve_kg_entities(triples, ctx_bc, threshold=0.99)
    got_map = {(r.entity, r.canonical) for r in mm.collect()}
    assert got_map == {("ent:acmecorp", "ent:acme")}
    rows = {(r.subj, r.pred, r.obj) for r in resolved.collect()}
    assert ("conv:2", "mentions", "ent:acme") in rows
    assert ("ent:acme", "co_mentioned", "ent:zebra") in rows
    assert ("conv:3", "mentions", "ent:notinvocab") in rows
    assert not any("acmecorp" in r[0] or "acmecorp" in r[2]
                   for r in rows)


def test_type_guard_blocks_disagreeing_pairs(spark):
    """VERDICT-r4 #7: cosine alone is not merge evidence. Four vectors
    on the SAME direction (cosine 1.0 pairwise): same-typed ids merge,
    the differently-typed one stays split, the NULL-typed one never
    merges (conservative: no evidence, no merge)."""
    v = [1.0] + [0.0] * (DIM - 1)
    pdf = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [v, v, v, v],
        "ctype": ["company", "company", "city", None],
    })
    df = spark.createDataFrame(pdf)
    unguarded = {r.entity: r.canonical
                 for r in resolve_entities(df, threshold=0.99,
                                           num_planes=0).collect()}
    assert unguarded == {0: 0, 1: 0, 2: 0, 3: 0}  # all collapse
    guarded = {r.entity: r.canonical
               for r in resolve_entities(df, threshold=0.99,
                                         num_planes=0,
                                         type_col="ctype").collect()}
    assert guarded == {0: 0, 1: 0, 2: 2, 3: 3}


def test_resolve_kg_type_guard_splits_false_pair(spark):
    """Pipeline form with type_guard: a planted FALSE pair — two labels
    with cosine above threshold whose canonical ontology types differ
    (one leans 'city', the other 'film') — must NOT merge, while the
    true alias pair (identical direction ⇒ same type) still does."""
    from duke_spark.fixtures.class_tree import mini_tree
    from duke_spark.operators.entity_resolution import resolve_kg_entities
    from duke_spark.operators.linking import LinkContext

    rng = np.random.default_rng(11)
    u1 = np.zeros(DIM); u1[0] = 1.0
    u2 = np.zeros(DIM); u2[1] = 1.0
    m = (u1 + u2) / np.sqrt(2)
    words = ["acme", "acmecorp", "metropol", "cinema"]
    vecs = [rng.normal(0, 1, DIM)] * 2  # identical → true aliases
    vecs = [vecs[0], vecs[0].copy(),
            m + 0.07 * u1,   # false pair: cosine ≈ 0.9955 ...
            m + 0.07 * u2]   # ... but argmax type city vs film
    for w in {w for c in mini_tree() for w in c.split(" ")}:
        if w == "city":
            words.append(w); vecs.append(u1)
        elif w == "film":
            words.append(w); vecs.append(u2)
        elif w not in words:
            # weak random vectors so no other class outranks the planted
            words.append(w); vecs.append(rng.normal(0, 0.05, DIM))
    ctx = LinkContext(words, np.asarray(vecs, dtype=np.float32),
                      mini_tree())
    ctx_bc = spark.sparkContext.broadcast(ctx)

    triples = spark.createDataFrame(pd.DataFrame(
        [("conv:1", "mentions", "ent:acme"),
         ("conv:2", "mentions", "ent:acmecorp"),
         ("conv:1", "mentions", "ent:metropol"),
         ("conv:2", "mentions", "ent:cinema")],
        columns=["subj", "pred", "obj"]))
    # sanity: without the guard the false pair merges too
    mm0, _ = resolve_kg_entities(triples, ctx_bc, threshold=0.99)
    assert {(r.entity, r.canonical) for r in mm0.collect()} == {
        ("ent:acmecorp", "ent:acme"), ("ent:metropol", "ent:cinema")}
    mm, resolved = resolve_kg_entities(triples, ctx_bc, threshold=0.99,
                                       type_guard=True)
    assert {(r.entity, r.canonical) for r in mm.collect()} == {
        ("ent:acmecorp", "ent:acme")}
    rows = {(r.subj, r.pred, r.obj) for r in resolved.collect()}
    assert ("conv:1", "mentions", "ent:metropol") in rows
    assert ("conv:2", "mentions", "ent:cinema") in rows


def test_merge_then_fact_support_consolidates(spark):
    """Composition: after the rewrite, fact_support counts evidence for
    the CANONICAL fact across its aliases."""
    from duke_spark.operators.triples import fact_support
    triples = spark.createDataFrame(pd.DataFrame(
        [("c1", 0, 1, "p", 2, 0.5), ("c2", 0, 1, "p", 3, 0.7)],
        columns=["conv_id", "turn_idx", "subj", "pred", "obj", "score"]))
    mm = spark.createDataFrame(pd.DataFrame(
        [(3, 2)], columns=["entity", "canonical"]))
    merged = apply_entity_merge(triples, mm)
    fs = fact_support(merged).collect()
    assert len(fs) == 1
    assert fs[0].n_support == 2 and fs[0].n_convs == 2
