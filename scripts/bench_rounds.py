"""Round-over-round bench tracking: run bench.py at one or more SF dirs
and merge with the driver-recorded BENCH_r{N}.json files into
BENCH/ROUNDS.md, so per-query regressions are visible between rounds
(VERDICT round-1 item 10).

    python scripts/bench_rounds.py              # sf0.01 + sf0.1
    python scripts/bench_rounds.py --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, env=env, cwd=REPO)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise SystemExit(f"bench failed at {sf_dir}:\n{proc.stderr[-2000:]}")
    return json.loads(lines[-1])


def driver_rounds() -> dict:
    out = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        name = os.path.basename(path)[:-len(".json")]
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or rec
        if "queries" in parsed:
            out[name] = parsed
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", action="append",
                    help="SF dir(s); default sf0.01 and sf0.1")
    args = ap.parse_args()
    sf_dirs = args.sf or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    fresh = {d: run_bench(d) for d in sf_dirs}
    rounds = driver_rounds()

    cols = list(rounds) + [f"now @ sf{fresh[d]['sf']}" for d in sf_dirs]
    queries = sorted({q for rec in list(rounds.values()) + list(fresh.values())
                      for q in rec["queries"]})
    lines = ["# BENCH/ROUNDS.md — per-query times across rounds",
             "",
             "Driver-recorded rounds (sf0.1) beside fresh runs. Seconds; "
             "'—' = query not present that round. Shared-VM capacity "
             "swings ~2×, so compare shapes, not ±20%.",
             "",
             "| query | " + " | ".join(cols) + " |",
             "|---|" + "---|" * len(cols)]
    recs = list(rounds.values()) + [fresh[d] for d in sf_dirs]
    for q in queries:
        cells = [f"{r['queries'][q]:.2f}" if q in r["queries"] else "—"
                 for r in recs]
        lines.append(f"| {q} | " + " | ".join(cells) + " |")
    totals = [f"**{r['value']:.1f}**" for r in recs]
    lines.append("| **total** | " + " | ".join(totals) + " |")
    kg = [f"{r.get('kg_triples_per_sec', 0):,.0f}" for r in recs]
    lines.append("| kg triples/s (in-bench) | " + " | ".join(kg) + " |")

    out_path = os.path.join(REPO, "BENCH", "ROUNDS.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    for d in sf_dirs:
        print(json.dumps(fresh[d]))


if __name__ == "__main__":
    main()
