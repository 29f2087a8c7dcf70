"""Gap-based sessionization — the standard event/transcript segmentation
operator (agent-session boundaries, user browse sessions).

Shape: one shuffle keyed by the entity (``Window.partitionBy(key)``),
then two window passes that stay inside that single exchange — ``lag``
marks gap breaks, a running ``sum`` of breaks numbers the sessions.
Session ids are a pure function of (key, ordered timestamps), so they
are stable across reruns and cluster sizes, like every other id in this
engine. Skewed keys (one bot user with millions of events) are the same
hazard as hot conversations — mitigate upstream with the salted
partitioning if a single key exceeds a task, though the window itself
must see a key's events together by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               out_col: str = "session_idx") -> DataFrame:
    """Append a 0-based per-key session index: a new session starts when
    the gap since the previous event exceeds ``gap_seconds``. Gap math is
    integer microseconds (``unix_micros`` / DuckDB ``epoch_us``) — exact
    on both engines. The window orders by ``ts_col`` alone; with
    duplicate per-key timestamps the tie order (and thus the index at a
    break) is engine-dependent, so feed a unique-timestamp table or
    pre-disambiguate."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_break = (F.when(prev.isNull(), F.lit(0))
                .when(us - prev > gap_seconds * 1_000_000, F.lit(1))
                .otherwise(F.lit(0)))
    return df.withColumn(
        out_col,
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))


def session_stats(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", gap_seconds: int = 1800) -> DataFrame:
    """Per-session rollup: event count, span seconds, start/end — the
    aggregate consumers actually read (one extra hash aggregate on the
    already-colocated (key, session) keys)."""
    s = sessionize(df, key_col, ts_col, gap_seconds)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (s.groupBy(key_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.max(us) - F.min(us)).alias("span_us")))


def session_window_stats(df: DataFrame, key_col: str = "user_id",
                         ts_col: str = "ts",
                         gap: str = "30 minutes") -> DataFrame:
    """The same per-session rollup via Spark's native ``session_window``
    — and because session_window is a streaming-capable grouping, the
    identical code runs over a ``readStream`` DataFrame with a watermark
    (merging windows in the state store). Boundary note: session_window
    starts a NEW session when the gap equals the timeout exactly, while
    ``sessionize`` keeps equality in-session (> vs ≥) — identical for
    any non-degenerate gap."""
    return (df.groupBy(key_col, F.session_window(F.col(ts_col), gap))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .select(key_col, "n_events", "session_start", "session_end"))
