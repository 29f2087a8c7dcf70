"""Synthesize an sf1-class bench dataset (10× sf0.1 rows) under /tmp.

The driver testdata stops at sf0.1; per-query curvature (quadratic-ish
suspects: jaccard pairs, near-dups) is invisible without a 10× point
(VERDICT r2 #6). Fact tables are replicated 10× with shifted keys;
dimension tables copy through. Two replication details keep the
WORKLOAD representative instead of pathological:

* document texts are word-ROTATED per replica (replica i rotates the
  word sequence by i) — shingle sets change, so replicas are NOT
  near-duplicates of each other; a naive 10× copy would turn every doc
  into a 10-clique of dups and measure an artificial workload;
* embeddings get a small deterministic per-replica perturbation for the
  same reason (identical vectors would make every vector a 10-way
  near-dup).

Deterministic: seeded by (replica, row index). Usage:
    python scripts/make_sf1.py [--src /root/testdata/sf0.1] [--out /tmp/sf1]
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPLICAS = 10
DIMS = ["region", "nation", "part", "supplier"]
# Key DOMAINS, not per-table keys (ADVICE r3): a foreign key must shift
# by the same amount as the primary key it references, or replica joins
# dangle (e.g. customers without orders make max(c_custkey) >
# max(o_custkey), so per-table shifts would misalign customer⋈orders for
# every replica ≥ 1 and change the measured join selectivity). One shift
# per domain = max over every column in the domain, applied everywhere.
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event_id": [("events", "event_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
KEY_SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def rotate_words(text: str, k: int) -> str:
    if not k:
        return text
    w = text.split(" ")
    k = k % max(len(w), 1)
    return " ".join(w[k:] + w[:k])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for t in DIMS:
        src = os.path.join(args.src, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(pq.read_table(src),
                           os.path.join(args.out, f"{t}.parquet"))
            print(f"{t}: copied")

    # one shared shift per key domain (see KEY_DOMAINS)
    domain_shift: dict[str, int] = {}
    col_shift: dict[tuple[str, str], int] = {}
    for dom, cols in KEY_DOMAINS.items():
        mx = -1
        for t, c in cols:
            src = os.path.join(args.src, f"{t}.parquet")
            if os.path.exists(src):
                mx = max(mx, int(pq.read_table(src, columns=[c])[c]
                                 .to_pandas().max()))
        domain_shift[dom] = mx + 1
        for t, c in cols:
            col_shift[(t, c)] = mx + 1

    for t, keys in KEY_SHIFT.items():
        src = os.path.join(args.src, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        base = pq.read_table(src).to_pandas()
        shift = {k: col_shift[(t, k)] for k in keys}
        parts = []
        for i in range(REPLICAS):
            rep = base.copy()
            for k in keys:
                rep[k] = rep[k] + i * shift[k]
            if t == "documents":
                rep["text"] = [rotate_words(s, i) for s in rep["text"]]
            if t == "events" and "user_id" in rep:
                rep["user_id"] = rep["user_id"] + i * (
                    int(base["user_id"].max()) + 1)
            if t == "embeddings":
                emb = np.stack(rep["embedding"].to_list()) \
                    .astype(np.float32)
                rng = np.random.default_rng(1234 + i)
                if i:
                    emb = emb + rng.normal(
                        0, 0.05, emb.shape).astype(np.float32)
                rep["embedding"] = list(emb)
            parts.append(rep)
        out = pd.concat(parts, ignore_index=True)
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: {len(base)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
