"""Real byte-pair-encoding tokenization — replaces the "chars/4" and
regex pre-token ESTIMATES in ``text_analysis.token_count`` with an
actual learned subword vocabulary for token-budget accounting.

Scale shape follows how BPE actually trains: the merge loop operates on
the WORD-FREQUENCY TABLE, not the corpus. So:

  * ``train_bpe``: ONE distributed word-count aggregate (the only
    corpus-sized step — partial+final hash agg), top ``max_words`` rows
    collected (bounded, deterministic order), then the classic
    greedy-merge loop driver-side over that table with an inverted
    pair→words index (each merge touches only the words containing the
    pair). 10⁴-ish merges over a 10⁵-word table is seconds of driver
    CPU regardless of corpus size.
  * ``apply_bpe``: Arrow-batched ``mapInPandas``; each DISTINCT word in
    a batch is encoded once (factorize) through a per-executor cache,
    then counts gather back per row. Merge application uses the rank
    table (lowest-rank adjacent pair first — the standard decode-time
    algorithm, identical to the trainer's greedy order).

Determinism: word table ordered by (count desc, word asc); merge
tie-break picks the lexicographically smallest best pair; no RNG.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"          # end-of-word marker, standard BPE


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _pair_stats(seqs: dict, freqs: dict):
    pairs: dict = {}
    where: dict = {}
    for w, seq in seqs.items():
        f = freqs[w]
        for p in zip(seq, seq[1:]):
            pairs[p] = pairs.get(p, 0) + f
            where.setdefault(p, set()).add(w)
    return pairs, where


def _merge_word(seq: Tuple[str, ...], pair: Tuple[str, str]
                ) -> Tuple[str, ...]:
    out, i, merged = [], 0, pair[0] + pair[1]
    while i < len(seq):
        if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
            out.append(merged)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 200,
              max_words: int = 50_000) -> List[List[str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position), JSON-serializable."""
    rows = (df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").count()
            .orderBy(F.desc("count"), F.asc("w"))
            .limit(max_words).collect())
    freqs = {r["w"]: int(r["count"]) for r in rows}
    seqs = {w: tuple(w) + (EOW,) for w in freqs}
    pairs, where = _pair_stats(seqs, freqs)

    merges: List[List[str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        # highest count; tie-break = lexicographically smallest pair
        best_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(list(best))
        for w in list(where.get(best, ())):
            old = seqs[w]
            f = freqs[w]
            for p in zip(old, old[1:]):
                pairs[p] -= f
                if pairs[p] <= 0:
                    pairs.pop(p, None)
                where.get(p, set()).discard(w)
            new = _merge_word(old, best)
            seqs[w] = new
            for p in zip(new, new[1:]):
                pairs[p] = pairs.get(p, 0) + f
                where.setdefault(p, set()).add(w)
    return merges


def save_merges(merges: Sequence[Sequence[str]], path: str) -> None:
    with open(path, "w") as f:
        json.dump(list(map(list, merges)), f)


def load_merges(path: str) -> List[List[str]]:
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict) -> List[str]:
    """Standard BPE apply: repeatedly merge the lowest-rank adjacent
    pair. Pure function — the pytest reference recomputes it directly."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def apply_bpe(df: DataFrame, merges: Sequence[Sequence[str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc REAL BPE token count (plus word count) under the learned
    merge table. Distinct words are encoded once per batch through a
    per-executor cache; everything else is NumPy gather."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    # id column keeps its ACTUAL input type (string / int32 / long all
    # valid doc ids) — hardcoding LongType failed Arrow conversion at
    # runtime for non-long ids despite the generic id_col parameter.
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_bpe_tokens", T.IntegerType()),
    ])
    pruned = df.select(id_col, F.split(F.col(text_col), " ").alias("ws"))
    cache: dict = {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["ws"].map(len).to_numpy(np.int64)
            flat = [w for ws in pdf["ws"] for w in ws]
            if not flat:
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                    "n_words": np.zeros(len(pdf), np.int32),
                                    "n_bpe_tokens":
                                        np.zeros(len(pdf), np.int32)})
                continue
            codes, uniq = pd.factorize(pd.Series(flat, dtype="object"))
            tok_per_word = np.empty(len(uniq), np.int64)
            for i, w in enumerate(uniq):
                n = cache.get(w)
                if n is None:
                    n = 0 if w == "" else len(encode_word(w, ranks))
                    cache[w] = n
                tok_per_word[i] = n
            per_token = tok_per_word[codes]
            ends = np.cumsum(lens)
            starts = ends - lens
            csum = np.concatenate([[0], np.cumsum(per_token)])
            sums = csum[ends] - csum[starts]
            n_words = np.fromiter(
                (sum(1 for w in ws if w) for ws in pdf["ws"]),
                np.int32, len(pdf))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "n_words": n_words,
                                "n_bpe_tokens": sums.astype(np.int32)})

    return pruned.mapInPandas(run, schema=schema)
