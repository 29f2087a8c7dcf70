"""spark-submit entry: run a declarative pattern query against a
materialized KG triple store.

The read side of the engine's query surface: ``build_kg.py`` writes the
store, this job answers SPARQL-core questions over it without any
Python plumbing on the user's side —

    python jobs/query_kg.py --store /tmp/kg/triples \\
        --pattern "?conv mentions ?e ; ?e co_mentioned{1,2} ?x" \\
        --negate "?e used_tool ?t" --out /tmp/answer

Pattern syntax: elements separated by ';', each element three
shell-quoted terms (shlex rules, so multi-word constants work:
``"?c mentions 'ent:home run'"``); ``?name`` is a variable,
``pred{1,k}`` a bounded property path, anything else a constant —
constants containing a literal ';' are the one unquotable case (';' is
the element separator). ``--optional`` / ``--negate`` take the same
syntax and may repeat. The store may be a parquet directory or an
iceberg-lite table (auto-detected; constants reach the parquet scan as
pushed filters either way).

Emits one JSON summary line (rows, variables, elapsed) like the other
jobs; ``--show N`` additionally prints up to N binding rows as JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_pattern(text: str) -> list[tuple[str, str, str]]:
    """'?a p ?b ; ?b q c' -> [('?a','p','?b'), ('?b','q','c')].

    Terms are shlex-split, so multi-word constants — the KG's entity
    terms ARE multi-word ('ent:home run') — are quoted:
    "?c mentions 'ent:home run'"."""
    import shlex

    elements = []
    for chunk in text.split(";"):
        try:
            terms = shlex.split(chunk)
        except ValueError as e:  # unbalanced quote
            raise SystemExit(f"bad pattern element {chunk!r}: {e}")
        if not terms:
            continue
        if len(terms) != 3:
            raise SystemExit(
                f"pattern element needs exactly 3 terms, got {chunk!r}")
        elements.append(tuple(terms))
    if not elements:
        raise SystemExit("empty pattern")
    return elements


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True,
                    help="triple store: parquet dir or iceberg-lite table"
                         " with subj/pred/obj columns")
    ap.add_argument("--pattern", required=True,
                    help="required BGP, e.g. '?c mentions ?e ; ?e p ?x'")
    ap.add_argument("--optional", action="append", default=[],
                    help="OPTIONAL group (repeatable)")
    ap.add_argument("--negate", action="append", default=[],
                    help="FILTER NOT EXISTS group (repeatable)")
    ap.add_argument("--out", help="write bindings parquet here")
    ap.add_argument("--show", type=int, default=0,
                    help="print up to N binding rows as JSON lines")
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from duke_spark.config import get_spark
    from duke_spark.operators.pattern import match_pattern, path_cache_scope
    from duke_spark.sources.iceberg_lite import (is_iceberg_lite_table,
                                                 read_table)
    from duke_spark.sources.triple_store import read_triple_store

    spark = get_spark("query_kg", master=f"local[{args.parallelism}]",
                      shuffle_partitions=max(8, args.parallelism))
    if is_iceberg_lite_table(args.store):
        triples = read_table(spark, args.store)
    elif os.path.isdir(args.store) and any(
            e.startswith("pred=") for e in os.listdir(args.store)):
        # predicate-partitioned store (build_kg --partition-triples):
        # constant predicates in the pattern prune whole partitions
        triples = read_triple_store(spark, args.store)
    else:
        triples = spark.read.parquet(args.store)

    t0 = time.time()
    # path_cache_scope: pred{1,k} closures persisted during compilation
    # are unpersisted when the scope exits — the result is materialized
    # (written or counted) inside it, so nothing recomputes
    with path_cache_scope():
        out = match_pattern(triples, parse_pattern(args.pattern),
                            optional=[parse_pattern(p)
                                      for p in args.optional] or None,
                            negate=[parse_pattern(p)
                                    for p in args.negate] or None)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            # everything below reads the WRITTEN parquet — the (possibly
            # expensive) query plan executes exactly once
            out = spark.read.parquet(args.out)
        elif args.show:
            out = out.persist()  # count + show without recomputing
        n = out.count()
    elapsed = time.time() - t0

    if args.show:
        for row in out.limit(args.show).collect():
            print(json.dumps(row.asDict()))
    print(json.dumps({"job": "query_kg", "store": args.store,
                      "variables": out.columns, "rows": int(n),
                      "elapsed_sec": round(elapsed, 3),
                      "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
