"""Token-budget domain mixing — the step that turns a cleaned corpus
into a pretraining MIX: "X% of tokens from wiki, Y% from web, inside a
total budget of B tokens".

    python jobs/mix_corpus.py --input /root/testdata/sf0.01 \
        --out /tmp/mix --weights web=0.5,wiki=0.3,code=0.2 \
        --token-budget 500000

Mechanism (all composition of first-class operators):
  1. one aggregate for available whitespace tokens per source;
  2. driver-side WATER-FILLING over the (tiny) source list: each
     source's rate = desired/available capped at 1.0; budget stranded by
     short sources is redistributed across the rest, iterating until
     stable — the standard fix for "not enough code tokens to hit 20%";
  3. `operators.sampling.stratified_sample` applies the rates as ONE
     narrow deterministic hash filter — reproducible across reruns,
     cluster sizes, and partitionings (no RNG state), resume-stable;
  4. writes the mixed corpus + a stats JSON with achieved vs requested
     shares.

At 100 TB: step 1 is one partial+final agg; step 3 is a pushable filter
at scan speed. Nothing shuffles the corpus.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def water_fill(avail: dict[str, int], weights: dict[str, float],
               budget: int) -> dict[str, float]:
    """Per-source sampling rates hitting ``weights`` of ``budget`` tokens,
    redistributing budget stranded by sources with too little data.
    Returns rates in [0, 1]; achieved total ≤ budget, with equality when
    the corpus holds enough tokens overall."""
    total_w = sum(weights.values())
    weights = {s: w / total_w for s, w in weights.items()}
    remaining = {s: w for s, w in weights.items() if avail.get(s, 0) > 0}
    rates = {s: 0.0 for s in weights}
    spend = {s: 0.0 for s in weights}
    left = float(budget)
    while remaining and left > 1e-9:
        wsum = sum(remaining.values())
        saturated = []
        for s, w in list(remaining.items()):
            want = left * w / wsum
            room = avail[s] - spend[s]
            if room <= want + 1e-9:
                spend[s] = float(avail[s])
                rates[s] = 1.0
                saturated.append(s)
        if not saturated:
            for s, w in remaining.items():
                spend[s] += left * w / wsum
                rates[s] = spend[s] / avail[s]
            break
        left = budget - sum(spend.values())
        for s in saturated:
            del remaining[s]
    return rates


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", required=True,
                    help="source=weight,... (token-share targets)")
    ap.add_argument("--token-budget", type=int, required=True)
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--salt", default="mix")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from duke_spark.config import get_spark
    from duke_spark.operators.sampling import stratified_sample

    weights = {}
    for part in args.weights.split(","):
        s, w = part.split("=")
        weights[s.strip()] = float(w)

    spark = get_spark("mix_corpus", master=f"local[{args.parallelism}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    avail = {r["source"]: int(r["toks"])
             for r in (docs.groupBy("source")
                       .agg(F.sum(n_tok).alias("toks")).collect())
             if r["source"] in weights}

    rates = water_fill(avail, weights, args.token_budget)
    mixed = stratified_sample(docs, rates, strata_col="source",
                              salt=args.salt)
    mixed.write.mode("overwrite").parquet(os.path.join(args.out, "mixed"))

    got = {r["source"]: int(r["toks"])
           for r in (spark.read.parquet(os.path.join(args.out, "mixed"))
                     .groupBy("source").agg(F.sum(n_tok).alias("toks"))
                     .collect())}
    total_got = sum(got.values()) or 1
    stats = {
        "job": "mix_corpus", "input": args.input,
        "token_budget": args.token_budget,
        "requested_weights": weights,
        "available_tokens": avail,
        "rates": {s: round(r, 6) for s, r in rates.items()},
        "achieved_tokens": got,
        "achieved_total": sum(got.values()),
        "achieved_weights": {s: round(t / total_got, 4)
                             for s, t in got.items()},
        "elapsed_sec": round(time.time() - t0, 2),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
