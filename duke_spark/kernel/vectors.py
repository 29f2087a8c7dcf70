"""Vector kernels: OOV masking, word-group embedding, cosine scoring.

Reference semantics being reimplemented (not copied):
  * all-or-nothing OOV rule — a word-group survives only if EVERY word is
    in vocab (``Duke/embedding.py:41-44`` applied at ``:28-30``);
  * word-group embedding = aggregation (default mean) of word vectors
    (``Duke/embedding.py:33-34``, ``Duke/utils.py:26-27``);
  * rows unit-normed so cosine == dot (``Duke/utils.py:22-23`` used at
    ``Duke/dataset.py:91`` and ``Duke/class_tree.py:32``);
  * scoring = one dense matmul of all group vectors against the class
    matrix (``Duke/dataset_descriptor.py:57``).

Everything operates on NumPy blocks so the Spark operators can call these
once per Arrow batch (vectorized), and the oracle can call them per source.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import numpy as np


class VocabEmbedding:
    """In-memory (vocab → row) float32 matrix, the broadcastable analogue of
    the reference's gensim model (``Duke/embedding.py:17``)."""

    def __init__(self, vocab: Sequence[str], matrix: np.ndarray):
        assert len(vocab) == matrix.shape[0]
        self.vocab: Dict[str, int] = {w: i for i, w in enumerate(vocab)}
        self.matrix = np.ascontiguousarray(matrix, dtype=np.float32)
        self.dim = matrix.shape[1]

    def in_vocab(self, words: Iterable[str]) -> bool:
        """All-words-in-vocab rule (``Duke/embedding.py:41-44``)."""
        return all(w in self.vocab for w in words)

    def embed_groups(self, groups: Sequence[Sequence[str]]) -> np.ndarray:
        """Mean word vector per group → unit-normed rows.

        Groups must already be OOV-filtered. Implemented as one gather +
        reduceat over the flattened index list — no per-word Python loop in
        the hot path beyond index lookup. All-float32, like the reference
        (gensim vectors are float32 and ``np.mean`` over them stays float32,
        ``Duke/utils.py:26-27``); at D=1000 the float32 gather also halves
        the memory traffic that dominates this kernel.
        """
        if not groups:
            return np.zeros((0, self.dim), dtype=np.float32)
        lengths = np.fromiter((len(g) for g in groups), dtype=np.int64,
                              count=len(groups))
        flat_idx = np.fromiter(
            (self.vocab[w] for g in groups for w in g), dtype=np.int64
        )
        gathered = self.matrix[flat_idx]
        starts = np.zeros(len(groups), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        sums = np.add.reduceat(gathered, starts, axis=0)
        means = sums / lengths[:, None].astype(np.float32)
        return unit_norm_rows(means)


def unit_norm_rows(vectors: np.ndarray) -> np.ndarray:
    """L2-normalize rows (``Duke/utils.py:22-23``). Zero rows stay zero."""
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return vectors / norms


def score_against_classes(group_vecs: np.ndarray,
                          class_matrix: np.ndarray) -> np.ndarray:
    """Cosine (== dot, both unit-normed) of every group vs every class —
    the core kernel (``Duke/dataset_descriptor.py:57``) as one BLAS call.

    Inputs stay float32 (gather/mean/norm, reference numerics + half the
    memory traffic) but the matmul ACCUMULATES in float64: float32
    products are exact in float64, so the result is independent of the
    sgemm blocking that varies with batch shape (M). That makes scores
    reproducible across any partitioning/batching to ~1e-16 — required
    for the 6-dp golden-oracle hash gate — where pure-f32 sgemm drifted
    ~1e-6 between the per-turn oracle and per-batch Spark paths."""
    return np.dot(group_vecs.astype(np.float64),
                  class_matrix.T.astype(np.float64))


def top1(scores: np.ndarray) -> np.ndarray:
    """Winning class index per row; ties → first occurrence, matching
    ``np.argmax`` at ``Duke/dataset_descriptor.py:84``."""
    return np.argmax(scores, axis=1)


def topk_desc(scores: np.ndarray, k: int) -> List[List[int]]:
    """Top-k class indices per row, score desc, ties by ascending index —
    the sort semantics of ``Duke/dataset_descriptor.py:91-97``."""
    k = min(k, scores.shape[1])
    # argsort on (-score, index): stable mergesort preserves index order.
    order = np.argsort(-scores, axis=1, kind="stable")
    return order[:, :k].tolist()


def chunk_in_vocab_runs(tokens: Sequence[str], vocab: Dict[str, int],
                        max_len: int = 3) -> List[List[str]]:
    """Mention segmentation: greedy left-to-right chunks (≤ ``max_len``) of
    consecutive in-vocab tokens; any OOV or empty token breaks the run.

    This realizes the reference's all-or-nothing OOV word-group rule
    (``Duke/embedding.py:41-44``) for free-text turns: every emitted chunk
    is fully in-vocab, and OOV words never surface in a mention.
    """
    out: List[List[str]] = []
    run: List[str] = []
    for tok in tokens:
        if tok and tok in vocab:
            run.append(tok)
            if len(run) == max_len:
                out.append(run)
                run = []
        else:
            if run:
                out.append(run)
            run = []
    if run:
        out.append(run)
    return out
