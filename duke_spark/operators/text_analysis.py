"""Text-analysis operators for training-data pipelines — all JVM-side
Catalyst built-ins (split/filter/transform/aggregate), no Python in the
hot path. Each returns a DataFrame suitable for a driver-contract oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Minimal per-language stopword sets for the n-gram/stopword language
# heuristic (public common-word lists).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is", "was", "on", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "para"],
}


def words_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


# BPE-ish pre-tokenizer pattern (GPT-2-style, ASCII subset): a leading
# space glued to the following word, numbers split out, punctuation runs
# kept together. Shared verbatim with the DuckDB oracle.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, a chars/4 subword estimate (the common
    'one token ≈ 4 chars' heuristic), and a BPE-ish regex pre-token count
    — all JVM-side."""
    w = words_col(text_col)
    return (df.withColumn("n_tokens", F.size(w))
              .withColumn("n_chars_actual", F.length(text_col))
              .withColumn("n_subword_est",
                          F.ceil(F.length(text_col) / F.lit(4)).cast("long"))
              .withColumn("n_bpe_tokens",
                          F.size(F.regexp_extract_all(
                              F.col(text_col), F.lit(BPE_PATTERN), 0))
                          .cast("long")))


def quality_scores(df: DataFrame, text_col: str = "text",
                   lang: str = "en") -> DataFrame:
    """Per-row quality features: word count, mean word length, stopword
    ratio, punctuation ratio, uppercase ratio."""
    w = words_col(text_col)
    stop = [F.lit(s) for s in STOPWORDS[lang]]
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS[lang])))
    total_word_chars = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.length(x))
    n_punct = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_upper = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    return (df
            .withColumn("n_words", n_words)
            .withColumn("mean_word_len",
                        total_word_chars / F.greatest(n_words, F.lit(1)))
            .withColumn("stopword_ratio",
                        n_stop / F.greatest(n_words, F.lit(1)))
            .withColumn("punct_ratio",
                        n_punct / F.greatest(F.length(text_col), F.lit(1)))
            .withColumn("upper_ratio",
                        n_upper / F.greatest(F.length(text_col), F.lit(1))))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language heuristic: language with the highest
    stopword hit ratio; 'und' (undetermined) when no list scores > 0."""
    w = words_col(text_col)
    scores = [
        F.struct(
            (F.size(F.filter(w, lambda x: x.isin(*sw))) /
             F.greatest(F.size(w), F.lit(1))).alias("score"),
            F.lit(lang).alias("lang"))
        for lang, sw in sorted(STOPWORDS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return (df.withColumn("_best", best)
            .withColumn("lang_pred",
                        F.when(F.col("_best.score") > 0, F.col("_best.lang"))
                        .otherwise(F.lit("und")))
            .withColumn("lang_score", F.col("_best.score"))
            .drop("_best"))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint (xxhash64 of the
    whitespace-normalized text) — the cheap exact-dup key."""
    normalized = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(normalized))


def unigram_logloss(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc mean negative log corpus-unigram probability — the classic
    cheap quality proxy (high = rare-word soup / garbled text, low =
    in-distribution). Pure Catalyst: one vocab-bounded hash aggregate for
    the frequency table, its grand total cross-joined back lazily (no
    driver action), then a word→freq join (broadcast when the vocab is
    small; AQE decides) and a per-doc aggregate. Cross-engine float
    policy: ``cnt·1.0/total`` then ``-ln``, averaged and rounded to 6dp
    on both sides."""
    words = (df.select(id_col, F.explode(F.split(F.col(text_col), " "))
                       .alias("w"))
             .filter(F.col("w") != ""))
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    joined = words.join(freq, "w").crossJoin(F.broadcast(total))
    p = F.col("cnt").cast("double") / F.col("total")
    return (joined.groupBy(id_col)
            .agg(F.round(F.avg(-F.log(p)), 6).alias("logloss"),
                 F.count(F.lit(1)).alias("n_words")))


def length_percentiles(df: DataFrame, probs=(0.5, 0.9, 0.99),
                       text_col: str = "text", group_col: str = "source",
                       exact: bool = False,
                       accuracy: int = 10000) -> DataFrame:
    """Per-group word-length quantiles — the corpus length-profile stats
    every data pipeline reports. ``exact=False`` (default) uses
    ``approx_percentile`` (Greenwald-Khanna sketch: one pass, bounded
    memory, mergeable partials — the 100 TB path); ``exact=True`` uses
    ``percentile``, whose linear interpolation matches DuckDB
    ``quantile_cont`` bit for bit (the oracle path). Both are a single
    partial+final hash aggregate."""
    n_words = F.size(F.split(F.col(text_col), " ")).cast("double")
    fn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, F.lit(accuracy)))
    aggs = [fn(n_words, F.lit(float(p)))
            .alias(f"p{str(p).replace('0.', '')}") for p in probs]
    return (df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"), *aggs))


def normalize_clean(df: DataFrame, text_col: str = "text",
                    out_col: str = "clean_text") -> DataFrame:
    """Unicode-sane text cleaning — the first stage of every corpus
    pipeline: NFC normalization (composed forms, so visually-identical
    strings dedup/hash identically), control characters → space, ASCII
    whitespace runs collapsed, edges trimmed. NFC needs ICU-class tables
    (no Catalyst builtin), so the kernel is a vectorized pandas pass
    (``Series.str.normalize`` — not per-row Python); the regex steps use
    the explicit ASCII class ``[ \\t\\n\\r\\f]`` rather than ``\\s`` so
    Python's unicode-aware ``\\s`` and RE2's ASCII ``\\s`` can't
    disagree (DuckDB ``nfc_normalize`` + the same regexes reproduce the
    output byte for byte)."""
    from typing import Iterator as _It

    out_fields = df.schema.fields + [T.StructField(out_col, T.StringType())]
    schema = T.StructType(out_fields)
    cols = [f.name for f in df.schema.fields]

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            s = pdf[text_col].fillna("").str.normalize("NFC")
            s = s.str.replace(r"[\x00-\x1f\x7f]", " ", regex=True)
            s = s.str.replace(r"[ \t\n\r\f]+", " ", regex=True)
            s = s.str.strip(" ")
            pdf = pdf[cols].copy()
            pdf[out_col] = s
            yield pdf

    return df.mapInPandas(run, schema=schema)


def tfidf_topk(df: DataFrame, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Top-k keywords per document by TF-IDF — the classic keyword /
    topic-signal extractor for corpus curation (what gets indexed,
    what a domain-mixing policy keys on).

    score = tf · ln(N / df) with raw in-doc term frequency tf and
    document frequency df; ties broken by word ascending so the top-k
    cut is deterministic and cross-engine reproducible. Pure Catalyst:
    one explode + (doc, word) hash agg (map-side partial combine), a
    word-level agg for document frequencies off the SAME aggregate
    (vocab-bounded), the N-docs total cross-joined as a broadcast 1-row
    frame (no driver action), and a per-doc window for the top-k cut.
    Scores rounded to 6dp (repo cross-engine float policy)."""
    from pyspark.sql import Window

    words = (df.select(id_col, F.explode(F.split(F.col(text_col), " "))
                       .alias("word"))
             .filter(F.col("word") != ""))
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = (df.select(id_col).distinct()
              .agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (tf.join(dfreq, "word")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf").cast("double") *
                                  F.log(F.col("n_docs").cast("double") /
                                        F.col("df")), 6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("word"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(id_col, "word", "tf", "df", "tfidf",
                    F.col("rnk").cast("long").alias("rnk")))
