"""CLI analogue of the reference's entry point (``Duke/scripts/main.py``):
"what is this dataset about?" over a transcript table.

    python jobs/describe_dataset.py --input /path/transcripts.parquet
    python jobs/describe_dataset.py --input t.csv --format csv --top 5
    python jobs/describe_dataset.py --convs 200      # synthetic input

Prints one JSON line: {"description": "This dataset is about X.",
"top": [[class, score], ...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "csv"])
    ap.add_argument("--convs", type=int, default=100)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--scale", default="mini", choices=["mini", "reference"])
    args = ap.parse_args()

    from duke_spark.config import get_spark
    from duke_spark.operators.describe import describe_dataset
    from duke_spark.pipeline import make_context
    from duke_spark.sources.transcripts import read_transcripts

    spark = get_spark("describe_dataset",
                      master=f"local[{args.parallelism}]")
    spark.sparkContext.setLogLevel("ERROR")

    if args.input:
        transcripts = read_transcripts(spark, args.input, args.format)
    else:
        from duke_spark.fixtures.transcripts import spark_transcripts
        transcripts = spark_transcripts(spark, n_convs=args.convs,
                                        max_turns=16, seed=42)

    if args.scale == "reference":
        from duke_spark.fixtures.scale import scale_arrays
        vocab, matrix, tree = scale_arrays()
        ctx_bc = make_context(spark, vocab=vocab, matrix=matrix,
                              raw_tree=tree)
    else:
        ctx_bc = make_context(spark)

    res = describe_dataset(transcripts, ctx_bc, top_n=args.top)
    print(json.dumps({"description": res["description"],
                      "top": [[c, round(s, 6)] for c, s in res["top"]]}))
    spark.stop()


if __name__ == "__main__":
    main()
