"""Synthetic multi-turn transcript generator (BASELINE.json input_hint schema).

Schema: (conv_id string, turn_idx int32, role string, text string,
tool string nullable, ts timestamp). Deterministic (seeded), with a
hot-conversation skew knob: one conversation receives ``hot_frac`` of all
turns so skew handling (salting/AQE) is exercised.

Text is seeded sentences over the fixture word lists: ~80% in-vocab tokens,
plus camelCase / snake_case / dash-joined tokens to exercise
``normalize_text`` parity with the reference (``Duke/utils.py:12-19``).
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Optional

import numpy as np
import pandas as pd

from duke_spark.fixtures.embedding import (CLASS_WORDS, CONTENT_WORDS,
                                           FILLER_WORDS, OOV_WORDS)

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "calculator", "browser", "sql", None, None]

BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)


def _make_sentence(rng: np.random.Generator) -> str:
    """6-14 tokens; ~72% content/class words, ~12% filler, ~8% OOV, ~8%
    composite (camelCase/snake_case/dash) tokens built from vocab words."""
    n = int(rng.integers(6, 15))
    toks = []
    for _ in range(n):
        r = rng.random()
        if r < 0.45:
            toks.append(CONTENT_WORDS[int(rng.integers(len(CONTENT_WORDS)))])
        elif r < 0.72:
            toks.append(CLASS_WORDS[int(rng.integers(len(CLASS_WORDS)))])
        elif r < 0.84:
            toks.append(FILLER_WORDS[int(rng.integers(len(FILLER_WORDS)))])
        elif r < 0.92:
            toks.append(OOV_WORDS[int(rng.integers(len(OOV_WORDS)))])
        else:
            a = CONTENT_WORDS[int(rng.integers(len(CONTENT_WORDS)))]
            b = CLASS_WORDS[int(rng.integers(len(CLASS_WORDS)))]
            style = int(rng.integers(3))
            if style == 0:
                toks.append(a + b.replace(" ", "").capitalize())  # camelCase
            elif style == 1:
                toks.append(f"{a}_{b.replace(' ', '_')}")          # snake
            else:
                toks.append(f"{a}-{b.replace(' ', '-')}")          # dash
    return " ".join(toks)


def generate_transcripts(n_convs: int = 20,
                         max_turns: int = 12,
                         seed: int = 42,
                         hot_frac: float = 0.0) -> pd.DataFrame:
    """Deterministic transcript table as a pandas DataFrame.

    hot_frac>0 gives conversation 0 approximately that fraction of all
    turns (skew knob, FIXTURES.md §1).
    """
    rng = np.random.default_rng(seed)
    total_turns_est = n_convs * (1 + max_turns) // 2
    rows = []
    for c in range(n_convs):
        if c == 0 and hot_frac > 0:
            n_turns = max(1, int(total_turns_est * hot_frac))
        else:
            n_turns = int(rng.integers(1, max_turns + 1))
        conv_id = f"conv_{c:06d}"
        for t in range(n_turns):
            role = ROLES[t % len(ROLES)]
            tool = TOOLS[int(rng.integers(len(TOOLS)))] if role == "tool" else None
            rows.append((conv_id, t, role, _make_sentence(rng), tool,
                         BASE_TS + dt.timedelta(minutes=t)))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                     "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # µs precision: Spark's parquet TimestampType reader rejects ns INT64
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def write_transcripts_parquet(path: str, **kw) -> str:
    """Write the generated table as parquet (Iceberg-compatible layout:
    plain parquet files under a table dir; the prod source would be
    ``spark.read.format("iceberg")`` per SURVEY B1)."""
    df = generate_transcripts(**kw)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df.to_parquet(path, index=False)
    return path


def spark_transcripts(spark, pdf: Optional[pd.DataFrame] = None, **kw):
    """Create a Spark DataFrame with the explicit input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    if pdf is None:
        pdf = generate_transcripts(**kw)
    return spark.createDataFrame(pdf, schema=schema)
