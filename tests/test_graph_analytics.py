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
