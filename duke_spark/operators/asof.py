"""As-of (time-series) join — the classic operator Spark's DataFrame API
lacks (pandas ``merge_asof``, DuckDB ``ASOF JOIN``, kdb ``aj``): attach
to each left row the latest right row whose ``on`` value is ≤ the left's
(``backward``), or the earliest ≥ (``forward``), per ``by`` key.

Spark-first implementation — the union + ignore-nulls window trick:

    1. union left and right into one layout, tagging the side; right
       payload columns ride as nulls on left rows and vice versa;
    2. one window per ``by`` key ordered by (on, side) — right rows sort
       BEFORE left rows at equal ``on``, making the match inclusive;
    3. ``last(struct, ignorenulls=True)`` over the unbounded-preceding
       window carries the latest right ROW (payload packed in one
       struct, so the match is row-atomic even with null payload fields)
       onto subsequent left rows (``first`` + following for ``forward``);
    4. keep left rows; optionally null out matches outside ``tolerance``.

Scale shape: exactly ONE shuffle (hash partition by ``by``) plus a
per-partition sort — the same cost as any co-grouped operation, with no
row multiplication (contrast a range-join formulation, which explodes to
candidate pairs before filtering). Window state is O(1) per row
(running "last seen per right column"). Hot ``by`` keys skew the sort
exactly as they would any keyed shuffle; salt upstream if one key
dominates. With ``by=None`` the window is global — a single-partition
sort, only for small frames (flagged in the docstring on purpose: the
API forces you to SAY you want that).

Matching DuckDB oracle (driver contract): ``ASOF LEFT JOIN`` with
``l.on >= r.on`` — semantics verified side by side, plus pandas
``merge_asof`` parity in pytest.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: Optional[Sequence[str]] = None,
              direction: str = "backward",
              tolerance: Optional[float] = None,
              suffix: str = "_matched") -> DataFrame:
    """Left as-of join. Output = all left rows + the matched right row's
    payload columns (null when no match), + ``{on}{suffix}`` = the
    matched right row's ``on`` value.

    ``tolerance``: maximum allowed |left.on − right.on| in the column's
    native numeric units (µs for timestamps); matches further away are
    nulled, like pandas ``merge_asof(tolerance=...)``.

    Right-side rows should be unique per (by, on) — with duplicates the
    window keeps the last in (on, input-order), which is
    partition-order-dependent; dedupe upstream for determinism (the same
    caveat every asof implementation carries)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, not "
                         f"{direction!r}")
    by = list(by) if by else []
    payload = [c for c in right.columns if c not in set(by) | {on}]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: "
                         f"{sorted(overlap)}; rename before joining")

    # numeric image of the `on` column for ordering/tolerance: timestamps
    # compare as µs, numerics as themselves
    def on_num(col):
        dt = dict(left.dtypes + right.dtypes)[on]
        # cast handles TIMESTAMP_NTZ, which unix_micros rejects directly
        return (F.unix_micros(col.cast("timestamp"))
                if dt.startswith("timestamp") else col)

    # The matched right row travels as ONE struct (_r_on + payload), so
    # last/first(ignorenulls) picks an entire row atomically: a struct
    # whose *fields* are null is still non-null, so a NULL in one payload
    # column of the true match is preserved rather than back-filled from
    # an older right row (pandas merge_asof semantics; per-column carry
    # would silently mix columns from different right rows).
    from pyspark.sql import types as T
    pack_type = T.StructType(
        [T.StructField("_r_on", right.schema[on].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload])
    l_tag = left.select(
        *by, F.col(on), F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in set(by) | {on}],
        F.lit(None).cast(pack_type).alias("_r_pack"))
    r_tag = right.select(
        *by, F.col(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in set(by) | {on}],
        F.struct(F.col(on).alias("_r_on"),
                 *[F.col(c) for c in payload]).alias("_r_pack"))
    u = l_tag.unionByName(r_tag)

    base = Window.partitionBy(*by) if by else Window.partitionBy()
    if direction == "backward":
        w = (base.orderBy(on_num(F.col(on)).asc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = F.last
    else:
        w = (base.orderBy(on_num(F.col(on)).asc(), F.col("_side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = F.first

    m = pick(F.col("_r_pack"), ignorenulls=True).over(w)
    left_cols = [c for c in left.columns]
    out = (u.select(*left_cols, "_side",
                    *[m[c].alias(c) for c in payload],
                    m["_r_on"].alias(f"{on}{suffix}"))
           .filter(F.col("_side") == 1).drop("_side"))

    if tolerance is not None:
        gap = F.abs(on_num(F.col(on)) - on_num(F.col(f"{on}{suffix}")))
        keep = gap <= F.lit(tolerance)
        out = out.select(
            *left_cols,
            *[F.when(keep, F.col(c)).alias(c) for c in payload],
            F.when(keep, F.col(f"{on}{suffix}")).alias(f"{on}{suffix}"))
    return out
