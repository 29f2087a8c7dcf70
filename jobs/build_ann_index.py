"""spark-submit entry: build / query a persisted partition-pruned ANN
index over an embeddings table.

    python jobs/build_ann_index.py build --input /root/testdata/sf0.01 \
        --index /tmp/ann_idx --kind lsh --planes 8
    python jobs/build_ann_index.py query --input /root/testdata/sf0.01 \
        --index /tmp/ann_idx --query-id 0 --k 10

Build writes the bucket/cluster-partitioned parquet + meta sidecar once;
every query after that reads ONLY the probed partitions
(PartitionFilters) — the persisted-index lifecycle the in-flight ANN
operators don't have.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "query"])
    ap.add_argument("--input", required=True,
                    help="sf dir containing embeddings.parquet")
    ap.add_argument("--index", required=True, help="index root dir")
    ap.add_argument("--kind", default="lsh", choices=["lsh", "ivf"])
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--clusters", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--query-id", type=int, default=0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--hamming", type=int, default=1)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from duke_spark.config import get_spark
    from duke_spark.operators.ann_index import (build_ivf_index,
                                                build_lsh_index,
                                                query_ivf_index,
                                                query_lsh_index)

    spark = get_spark("ann_index", master=f"local[{args.parallelism}]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.input, "embeddings.parquet"))
    t0 = time.time()

    if args.mode == "build":
        dim = len(emb.select("embedding").head()[0])
        if args.kind == "lsh":
            meta = build_lsh_index(emb, args.index, dim=dim,
                                   num_planes=args.planes, seed=args.seed)
        else:
            meta = build_ivf_index(emb, args.index,
                                   k_clusters=args.clusters, seed=args.seed)
        print(json.dumps({"job": "ann_index_build", "kind": args.kind,
                          "rows": emb.count(), "dim": dim,
                          "index": args.index,
                          "elapsed_sec": round(time.time() - t0, 2),
                          "meta": {k: v for k, v in meta.items()
                                   if k != "centroids"}}))
    else:
        qvec = (emb.filter(F.col("vec_id") == args.query_id)
                .select("embedding").head()[0])
        if args.kind == "lsh":
            res = query_lsh_index(spark, args.index, qvec, k=args.k,
                                  hamming=args.hamming)
        else:
            res = query_ivf_index(spark, args.index, qvec, k=args.k,
                                  n_probe=args.n_probe)
        rows = [{"vec_id": r["vec_id"], "cosine": round(r["cosine"], 6)}
                for r in res.collect()]
        print(json.dumps({"job": "ann_index_query", "kind": args.kind,
                          "query_id": args.query_id, "k": args.k,
                          "elapsed_sec": round(time.time() - t0, 2),
                          "results": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
