"""Graph analytics over the materialized KG: degrees, two-hop motifs,
PageRank power iteration."""

import pandas as pd
import pytest

from duke_spark.operators.graph import degrees, pagerank, two_hop_neighbors

EDGES = [  # a ring 0→1→2→0 plus a hub 9 pointed at by everyone
    ("v0", "v1"), ("v1", "v2"), ("v2", "v0"),
    ("v0", "v9"), ("v1", "v9"), ("v2", "v9"), ("v3", "v9"),
    ("v9", "v0"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        pd.DataFrame(EDGES, columns=["src", "dst"]))


def test_degrees(spark, edges):
    d = degrees(edges).toPandas().set_index("id")
    assert d.loc["v9", "in_deg"] == 4 and d.loc["v9", "out_deg"] == 1
    assert d.loc["v3", "out_deg"] == 1 and d.loc["v3", "in_deg"] == 0
    assert d["degree"].sum() == 2 * len(EDGES)


def test_two_hop_paths(spark, edges):
    out = two_hop_neighbors(edges).toPandas()
    paths = {(r.a, r.c): r.n_paths for r in out.itertuples()}
    assert paths[("v0", "v2")] == 1          # v0→v1→v2
    assert paths[("v3", "v0")] == 1          # v3→v9→v0
    assert ("v0", "v0") not in paths         # a ≠ c filtered
    # hub cap: with the hub excluded as a middle, v3 reaches nothing
    capped = two_hop_neighbors(edges, max_paths_per_mid=3).toPandas()
    capped_pairs = set(map(tuple, capped[["a", "c"]]
                           .itertuples(index=False)))
    assert ("v3", "v0") not in capped_pairs
    assert ("v0", "v2") in capped_pairs      # non-hub paths survive


def _reference_pagerank(edge_list, iters, damping=0.85):
    nodes = sorted({v for e in edge_list for v in e})
    out = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 for v in nodes}
    n = len(nodes)
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edge_list:
            contrib[d] += rank[s] / out[s]
        dangling = (n - sum(rank[v] for v in nodes if v in out)) / n
        rank = {v: (1 - damping) + damping * (contrib[v] + dangling)
                for v in nodes}
    return rank


def test_pagerank_matches_reference(spark, edges):
    got = pagerank(edges, iters=8).toPandas().set_index("id")["rank"]
    exp = _reference_pagerank(EDGES, iters=8)
    assert set(got.index) == set(exp)
    for v, r in exp.items():
        assert got[v] == pytest.approx(r, rel=1e-9), v
    # no in-edges → the (1-d) floor; the hub's sole target tops the list
    assert got["v3"] == pytest.approx(0.15, rel=1e-9)
    assert got["v0"] == got.max()
    # total rank mass conserved (dangling redistribution)
    assert got.sum() == pytest.approx(len(exp), rel=1e-9)


def test_pagerank_one_action_per_iteration(spark, edges):
    """The dangling-mass total rides the contributions aggregate as a
    broadcast 1-row frame — no per-iteration driver collect scanning the
    rank table. Each power iteration is ONE action (the eager
    localCheckpoint); the only other job Spark runs per iteration is the
    build of that 1-row broadcast (BroadcastExchange materializes its
    child with its own tiny job), so the pinned count is 2."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(iters):
        group = f"pr-jobcount-{iters}"
        sc.setJobGroup(group, "pagerank job-count probe")
        try:
            pagerank(edges, iters=iters).count()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    # AQE materializes every exchange as its own job, and auto-broadcast
    # of the tiny test tables adds size-dependent broadcast-build jobs;
    # switch both off so the count measures the algorithm, not the plan
    # heuristics for 8-row inputs.
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # fixed setup cost (vertex count, checkpoint of rank=1, final
        # count) cancels in the difference; 3 extra iterations must cost
        # exactly 3 × (checkpoint + 1-row broadcast build) = 6 jobs
        assert jobs_for(5) - jobs_for(2) == 6
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def _bfs_ref(edge_list, sources, directed=True):
    adj = {}
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_shortest_paths_matches_bfs(spark, edges):
    from duke_spark.operators.graph import shortest_paths
    got = (shortest_paths(edges, ["v3"]).toPandas()
           .set_index("id")["distance"].to_dict())
    assert got == _bfs_ref(EDGES, ["v3"])          # v3→v9→v0→{v1,...}
    assert got["v3"] == 0 and got["v9"] == 1 and got["v0"] == 2
    # multi-source takes the nearest seed; undirected reaches more
    multi = (shortest_paths(edges, ["v3", "v2"]).toPandas()
             .set_index("id")["distance"].to_dict())
    assert multi == _bfs_ref(EDGES, ["v3", "v2"])
    undirected = (shortest_paths(edges, ["v3"], directed=False)
                  .toPandas().set_index("id")["distance"].to_dict())
    assert undirected == _bfs_ref(EDGES, ["v3"], directed=False)


def test_shortest_paths_random_graph(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    edge_list = list({(f"n{a}", f"n{b}") for a, b in
                      rng.integers(0, 40, (150, 2)) if a != b})
    df = spark.createDataFrame(pd.DataFrame(edge_list,
                                            columns=["src", "dst"]))
    from duke_spark.operators.graph import shortest_paths
    got = (shortest_paths(df, ["n0", "n1"], max_hops=20).toPandas()
           .set_index("id")["distance"].to_dict())
    assert got == _bfs_ref(edge_list, ["n0", "n1"])


def test_entity_cooccurrence_pmi(spark):
    """PMI pinned against hand-computed conversation-level counts, and
    the hub-conversation cap excludes oversized conversations."""
    import math

    from duke_spark.operators.graph import entity_cooccurrence_pmi

    # 4 convs; (a,b) co-occur in 2 of them; c rides along once
    rows = []
    for conv, ents in [("c1", ["a", "b"]), ("c2", ["a", "b", "c"]),
                       ("c3", ["a"]), ("c4", ["b"])]:
        for e in ents:
            rows.append((conv, 0, f"conv:{conv}", "mentions", f"ent:{e}",
                         0.5))
    triples = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj",
                                    "pred", "obj", "score"]))
    res = entity_cooccurrence_pmi(triples)
    out = res.toPandas()
    res.unpersist()  # caller owns the returned cache (docstring)
    got = {(r.ent_a, r.ent_b): (r.n_pairs, r.pmi)
           for r in out.itertuples()}
    # P(ab)=2/4, P(a)=3/4, P(b)=3/4 → pmi = ln(2*4/(3*3))
    assert got[("ent:a", "ent:b")] == (2, round(math.log(8 / 9), 6))
    assert got[("ent:a", "ent:c")] == (1, round(math.log(4 / 3), 6))
    assert got[("ent:b", "ent:c")] == (1, round(math.log(4 / 3), 6))
    assert len(got) == 3
    # cap: excluding convs with >2 entities drops c2, so (a,c)/(b,c)
    # vanish and (a,b) drops to 1 pair — AND (ADVICE-r4) the marginals
    # and the conv total come from the SAME capped universe, so the PMI
    # is the unbiased value of that event space: 3 convs remain
    # (c1,c3,c4), P(ab)=1/3, P(a)=2/3, P(b)=2/3 → ln(1·3/(2·2))
    res2 = entity_cooccurrence_pmi(triples, max_entities_per_conv=2)
    capped = res2.toPandas()
    res2.unpersist()
    cg = {(r.ent_a, r.ent_b): (r.n_pairs, r.pmi)
          for r in capped.itertuples()}
    assert cg == {("ent:a", "ent:b"): (1, round(math.log(3 / 4), 6))}


def test_entity_timeline(spark):
    """first/last seen + spread pinned against a hand-computed fixture:
    one entity across two conversations at different turns, one
    single-mention entity, non-mention triples ignored."""
    from duke_spark.operators.graph import entity_timeline

    base = pd.Timestamp("2026-01-01 00:00:00")
    turns = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "user"],
        "text": ["t"] * 3,
        "tool": [None] * 3,
        "ts": [base, base + pd.Timedelta(minutes=7), base],
    }))
    rows = [
        ("c1", 0, "conv:c1", "mentions", "ent:a", 0.5),
        ("c1", 1, "conv:c1", "mentions", "ent:a", 0.5),
        ("c2", 0, "conv:c2", "mentions", "ent:a", 0.5),
        ("c1", 1, "conv:c1", "mentions", "ent:b", 0.5),
        ("c1", 0, "conv:c1", "uses_tool", "tool:x", 0.5),  # ignored
    ]
    triples = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj",
                                    "pred", "obj", "score"]))
    out = entity_timeline(triples, turns).toPandas().set_index("entity")
    assert len(out) == 2
    a = out.loc["ent:a"]
    assert a["first_seen"] == base
    assert a["last_seen"] == base + pd.Timedelta(minutes=7)
    assert a["n_convs"] == 2 and a["n_mentions"] == 3
    b = out.loc["ent:b"]
    assert b["first_seen"] == b["last_seen"] == base + \
        pd.Timedelta(minutes=7)
    assert b["n_convs"] == 1 and b["n_mentions"] == 1


def test_entity_timeline_empty(spark):
    from duke_spark.operators.graph import entity_timeline

    turns = spark.createDataFrame(
        [], "conv_id string, turn_idx int, ts timestamp")
    triples = spark.createDataFrame(
        [], "conv_id string, turn_idx int, subj string, pred string, "
            "obj string, score double")
    assert entity_timeline(triples, turns).count() == 0
