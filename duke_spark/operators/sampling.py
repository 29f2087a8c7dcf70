"""Deterministic sampling for corpus construction (domain mixing).

A pretraining mix is a per-source sampling rate ("keep 100% of wiki, 30%
of web"). At 100 TB the sample must be (a) a pure filter — no shuffle, no
RNG state, reproducible across reruns/cluster sizes — and (b) stable
under resume. Both follow from hashing the row KEY: keep iff
``md5(salt:key) < threshold(rate)``, where the threshold is the 128-bit
fraction written as a 32-hex-char literal (md5's hex form orders
lexicographically exactly like the 128-bit value, so the comparison stays
a plain string ``<`` that any engine — and the DuckDB oracle — evaluates
identically).

Contrast with ``df.sample(fraction, seed)``: Spark's sampler is
partition-order dependent (same seed, different partitioning → different
rows), which breaks resume identity; the hash filter never does.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_threshold(frac: float) -> str:
    """32-hex-char literal t with P[md5(x) < t] == frac (md5 uniform)."""
    frac = min(max(frac, 0.0), 1.0)
    return f"{int(frac * (1 << 128)):032x}"[:32]


def sample_hash(key_col: str, salt: str = "sample") -> Column:
    return F.md5(F.concat(F.lit(f"{salt}:"),
                          F.col(key_col).cast("string")).cast("binary"))


def deterministic_sample(df: DataFrame, frac: float,
                         key_col: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Keep a ``frac`` fraction of rows, decided per row key."""
    if frac >= 1.0:
        return df
    if frac <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(sample_hash(key_col, salt) < F.lit(md5_threshold(frac)))


def stratified_sample(df: DataFrame, rates: Dict[str, float],
                      strata_col: str = "source",
                      key_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Per-stratum rates (the domain-mixing filter). Strata absent from
    ``rates`` are dropped. One narrow filter stage — the predicate is a
    flat OR of (stratum, threshold) tests, pushable and codegen-friendly.
    """
    h = sample_hash(key_col, salt)
    cond = F.lit(False)
    for stratum, frac in sorted(rates.items()):
        if frac >= 1.0:
            keep = F.lit(True)
        elif frac <= 0.0:
            keep = F.lit(False)
        else:
            keep = h < F.lit(md5_threshold(frac))
        cond = cond | ((F.col(strata_col) == stratum) & keep)
    return df.filter(cond)
