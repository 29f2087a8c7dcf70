"""Range (interval) join — pair left rows with right rows whose ``on``
value falls in ``[left.on + lower, left.on + upper]``, per ``by`` key.

Spark's DataFrame API expresses this only as a non-equi join condition,
which Catalyst executes as BroadcastNestedLoopJoin (or a full cartesian
per key) — O(|L|·|R|) and a known scale-killer. The standard fix (what
Databricks' range-join optimization and DuckDB's IEJoin do internally)
is BUCKETIZATION, done here with plain DataFrame ops:

    1. bucket width w = (upper − lower), the interval length: any left
       interval spans AT MOST TWO buckets of width w;
    2. explode each left row to its ≤2 covering buckets (a 2-element
       array → explode, so row growth is bounded ×2, independent of
       data); right rows map to exactly one bucket;
    3. equi-join on (by…, bucket) — a plain shuffle hash join with
       uniform-ish keys — then apply the exact range predicate as a
       post-filter.

Cost: one shuffle of ≤2|L| + |R| rows; candidate pairs are only those
within one bucket width, so the post-filter discards < half on average
uniform data. Degenerate case upper == lower (exact offset match)
falls back to width max(upper−lower, 1µs-equivalent unit).

At 100 TB: the bucket key rides WITH the ``by`` key in the shuffle, so
hot users skew exactly as any keyed join — salt upstream if needed.
Compare ``asof_join`` (nearest single match, window-based, no row
growth) — use that when you want one match, this when you want ALL
matches in a window (e.g. attribution: every click within an hour
before a purchase).

Oracle parity: DuckDB executes the same semantics via its IEJoin from
the plain BETWEEN join (driver contract query ``range_join_events``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _on_num(df_dtypes: dict, on: str, col):
    dt = df_dtypes[on]
    return (F.unix_micros(col.cast("timestamp"))
            if dt.startswith("timestamp") else col.cast("long"))


def range_join(left: DataFrame, right: DataFrame, on: str = "ts",
               by: Optional[Sequence[str]] = None,
               lower: int = 0, upper: int = 0,
               suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """All (left, right) pairs with ``right.on − left.on ∈ [lower,
    upper]`` (numeric units; µs for timestamps), equal ``by`` keys.

    Output columns: by keys once, then every non-key column of left and
    right, suffixed on name collision."""
    if upper < lower:
        raise ValueError(f"upper ({upper}) < lower ({lower})")
    by = list(by) if by else []
    l_dt, r_dt = dict(left.dtypes), dict(right.dtypes)

    l_payload = [c for c in left.columns if c not in by]
    r_payload = [c for c in right.columns if c not in by]
    collide = set(l_payload) & set(r_payload)
    l_sel = [F.col(c).alias(c + suffixes[0] if c in collide else c)
             for c in l_payload]
    r_sel = [F.col(c).alias(c + suffixes[1] if c in collide else c)
             for c in r_payload]
    l_on = on + suffixes[0] if on in collide else on
    r_on = on + suffixes[1] if on in collide else on

    w = max(upper - lower, 1)
    l_num = _on_num(l_dt, on, F.col(on))
    r_num = _on_num(r_dt, on, F.col(on))

    # left interval [on+lower, on+upper] covers buckets floor((on+lower)/w)
    # and floor((on+upper)/w) — at most two, dedup when equal
    lo_b = F.floor((l_num + F.lit(lower)) / F.lit(w))
    hi_b = F.floor((l_num + F.lit(upper)) / F.lit(w))
    l_tag = (left
             .withColumn("_lnum", l_num)
             .withColumn("_bucket",
                         F.explode(F.array_distinct(F.array(lo_b, hi_b))))
             .select(*by, "_bucket", "_lnum", *l_sel))
    r_tag = (right
             .withColumn("_rnum", r_num)
             .withColumn("_bucket", F.floor(r_num / F.lit(w)))
             .select(*by, "_bucket", "_rnum", *r_sel))

    joined = l_tag.join(r_tag, [*by, "_bucket"])
    delta = F.col("_rnum") - F.col("_lnum")
    return (joined
            .filter((delta >= F.lit(lower)) & (delta <= F.lit(upper)))
            .drop("_bucket", "_lnum", "_rnum"))
