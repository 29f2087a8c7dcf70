"""Column-level function library — the engine's `F`-style namespace.

Everything here is a pure Column-in/Column-out helper (JVM-side Catalyst
expressions; whole-stage codegen) reused across operators and the driver
contract. NumPy batch kernels live in ``duke_spark.kernel``; DataFrame-in
/DataFrame-out operators in ``duke_spark.operators``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from duke_spark.operators.dedup import with_shingles  # noqa: F401
from duke_spark.operators.similarity import _dot as vector_dot  # noqa: F401
from duke_spark.operators.text_analysis import (  # noqa: F401
    BPE_PATTERN, STOPWORDS, words_col)


def cents(col: str | Column) -> Column:
    """2-dp money double → exact integer cents (associative sums; see
    the cross-engine float policy in ``__spark_entry__``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def bpe_token_count(col: str | Column) -> Column:
    """BPE-ish pre-token count (GPT-2-style regex, ASCII subset)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)) \
        .cast("long")


def normalized_text(col: str | Column) -> Column:
    """Whitespace-normalized text (trim + collapse runs) — the content
    key used by fingerprints and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), r"\s+", " ")


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    w = F.split(F.col(col) if isinstance(col, str) else col, " ")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS[lang])))
    return n_stop / F.greatest(F.size(w), F.lit(1))


def cosine_to(vec_col: str | Column, query: Sequence[float]) -> Column:
    """Cosine similarity of an array<float> column to a constant vector,
    double precision, index order (bit-deterministic)."""
    import numpy as np
    q = [float(x) for x in query]
    qn = float(np.sqrt(sum(x * x for x in q)))
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    qlit = F.array(*[F.lit(x) for x in q])
    dot = vector_dot(c, qlit)
    norm = F.sqrt(vector_dot(c, c))
    return dot / (norm * F.lit(qn))


def content_key(col: str | Column = "text") -> Column:
    """md5 fingerprint of whitespace-normalized text — the dedup key
    shared by fingerprint_docs and streaming exact-dedup."""
    return F.md5(normalized_text(col).cast("binary"))


# deterministic sampling + bucketing re-exports (operator-level docs there)
from duke_spark.operators.sampling import (  # noqa: E402,F401
    md5_threshold, sample_hash)
from duke_spark.operators.similarity import (  # noqa: E402,F401
    coord_sign_bucket)
