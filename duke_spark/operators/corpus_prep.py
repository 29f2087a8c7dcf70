"""Corpus-preparation operators every LLM training pipeline runs between
cleaning and tokenization: fixed-size chunking with overlap, PII
scrubbing, and repeated-n-gram scoring (the Gopher/MassiveText
repetition quality signal). All pure Catalyst — split/slice/transform/
regexp over JVM arrays, no Python, no shuffle — so they run at scan
speed and compose with the `jobs/clean_corpus.py` stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_words: int = 128,
                    overlap: int = 16) -> DataFrame:
    """Split each document into word-window chunks of ``chunk_words``
    with ``overlap`` words carried between consecutive chunks — the
    standard pre-tokenization unit for embedding / training pipelines.

    One narrow projection + explode: chunk i = words[i·step, i·step +
    chunk_words) with step = chunk_words − overlap; the last chunk may
    be short; every word lands in ≥1 chunk. Row growth is
    ceil(n/step) — bounded and proportional to data, no shuffle."""
    if not 0 <= overlap < chunk_words:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_words "
                         f"({chunk_words})")
    step = chunk_words - overlap
    ws = F.split(F.col(text_col), " ")

    # let-bind the word array: a lambda body referencing a non-lambda
    # subexpression re-evaluates it per element (here: re-splitting the
    # whole text once per chunk) — see lang_id.py for the jstack evidence
    def chunks_of(w):
        n = F.size(w)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int"),
            F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.slice(w, i * step + 1, chunk_words).alias("cw")))

    pairs = F.flatten(F.transform(F.array(ws), chunks_of))
    return (df
            .select(id_col, F.explode(pairs).alias("c"))
            .select(id_col,
                    F.col("c.chunk_idx").alias("chunk_idx"),
                    F.array_join(F.col("c.cw"), " ").alias("chunk_text"),
                    F.size(F.col("c.cw")).alias("n_words")))


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Conservative, lookaround-free patterns valid in BOTH Java regex (Spark)
# and RE2-ish engines (DuckDB), so the oracle can replay them verbatim.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\+[0-9][0-9 ().-]{6,}[0-9]", "<PHONE>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "scrubbed_text",
              patterns=None) -> DataFrame:
    """Mask PII-shaped spans (emails, IPv4s, +intl phone runs, SSN-style
    ids) with typed placeholders. A chain of JVM ``regexp_replace``
    calls — order matters (emails before phones so digits inside an
    address aren't half-masked) and is fixed by ``PII_PATTERNS``.

    Heuristic by design: the pattern list is the policy knob, the
    operator is the mechanism. Patterns avoid lookarounds so the same
    strings run unchanged on Java regex and RE2 (DuckDB oracle)."""
    col = F.col(text_col)
    for pat, repl in (patterns or PII_PATTERNS):
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col, col)


# ---------------------------------------------------------------------------
# repetition scoring
# ---------------------------------------------------------------------------


def repetition_scores(df: DataFrame, text_col: str = "text",
                      ngram: int = 3) -> DataFrame:
    """Duplicate word-n-gram fraction per document — the repetition
    quality signal (Rae et al., Gopher appendix): 1 − distinct/total
    n-grams. 0 for texts shorter than ``ngram`` words. High values flag
    boilerplate loops and degenerate generations.

    Pure per-row array work: the n-gram array is built once with a
    single index transform; ratio rounded to 6dp (cross-engine float
    policy)."""
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    n_grams = n - F.lit(ngram - 1)

    # let-bind ws: referencing the split() result inside the per-position
    # lambda would re-split the WHOLE text once per n-gram — O(n²) chars
    # per row (see lang_id.py for the per-element-recompute evidence)
    def grams_of(w):
        ng = F.size(w) - F.lit(ngram - 1)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(ng, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(ngram)]))

    grams = F.transform(F.array(ws), grams_of)[0]
    ratio = F.when(
        n_grams >= 1,
        F.round(F.lit(1.0) -
                F.size(F.array_distinct(grams)) /
                n_grams.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return (df.withColumn("n_ngrams", F.greatest(n_grams, F.lit(0)))
              .withColumn("rep_ratio", ratio))
