"""Mimic the grading driver: run every __spark_entry__ query on Spark and
its oracle on DuckDB at sf0.01; compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from duke_spark.config import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def dtype_kinds(pdf: pd.DataFrame) -> dict:
    """Map column -> numpy dtype kind ('i', 'f', 'O', 'b', 'M', ...).

    The grading driver hashes raw string forms, so an int64 Spark column vs
    a float64 oracle column (DuckDB HUGEINT -> pandas float) mismatches at
    the driver ("17" vs "17.0") even when norm_cell's %.9g collapses them
    locally. Comparing kinds catches that class before the driver does.
    Integer-vs-integer width differences (i vs i) are fine; nullable ints
    that pandas promoted to object/float on the *same* side as NaNs are
    reported so they can be CAST in the oracle.
    """
    return {c: pdf[c].dtype.kind for c in pdf.columns}


def kinds_compatible(gk: str, ek: str) -> bool:
    if gk == ek:
        return True
    # unsigned/signed int mix is representation-identical under str()
    return {gk, ek} <= {"i", "u"}


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "|".join(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = argv or None
    cpus = int(os.environ.get("CONTRACT_CPUS", "8"))
    spark = get_spark("contract_check", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    con = duckdb.connect()
    for t in entry.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            records[name] = {"err": f"spark: {type(e).__name__}: {e}"}
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows, "
                  f"cols={sorted(got.columns)} ({el:.1f}s)")
            records[name] = {"rows": len(got), "err": "no_oracle",
                             "spark_sec": round(el, 2)}
            if len(got) == 0:
                failures.append(name)
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures.append(name)
            records[name] = {"err": f"duckdb: {e}"}
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = frame_hash(got) == frame_hash(exp)
        bad_kinds = []
        if ok_cols:
            gk, ek = dtype_kinds(got), dtype_kinds(exp)
            bad_kinds = [(c, gk[c], ek[c]) for c in got.columns
                         if not kinds_compatible(gk[c], ek[c])]
        ok_kinds = not bad_kinds
        status = ("OK   " if (ok_rows and ok_cols and ok_hash and ok_kinds)
                  else "FAIL ")
        print(f"{status} {name}: rows {len(got)}/{len(exp)} "
              f"cols={'ok' if ok_cols else (sorted(got.columns), sorted(exp.columns))} "
              f"hash={'ok' if ok_hash else 'MISMATCH'} "
              f"kinds={'ok' if ok_kinds else bad_kinds} ({el:.1f}s)")
        records[name] = {
            "rows": len(got), "oracle_rows": len(exp),
            "rows_match": ok_rows, "cols_match": ok_cols,
            "hash_match": ok_hash, "kinds_match": ok_kinds,
            "spark_sec": round(el, 2)}
        if status.startswith("FAIL"):
            failures.append(name)
            if ok_cols and not ok_hash:
                cols = sorted(got.columns)
                g = got[cols].sort_values(cols).reset_index(drop=True)
                e_ = exp[cols].sort_values(cols).reset_index(drop=True)
                if len(g) == len(e_):
                    diff = (g.astype(str) != e_.astype(str)).any(axis=1)
                    print("  first diffs:")
                    print(pd.concat([g[diff].head(3), e_[diff].head(3)],
                                    keys=["spark", "duck"]).to_string())
    print("\nFAILURES:", failures or "none")
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({"sf_dir": SF_DIR, "cpus": cpus,
                       "n_queries": len(records),
                       "n_failures": len(failures),
                       "failures": failures,
                       "queries": records}, f, indent=1)
        print(f"wrote {json_out}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
