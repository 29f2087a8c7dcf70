"""Custom stateful streaming operator: incremental per-conversation topic.

``running_conversation_topics`` maintains, per ``conv_id``, the running
count-weighted sum of class-score vectors over every mention seen so far
(the algebraic partial of Duke's row mean, ``Duke/dataset_descriptor.py:
73-74``) in the Spark state store via ``applyInPandasWithState``. Each
micro-batch:

  1. the stateless linking kernel turns new turns into linked mentions
     (same ``link_batch`` as batch mode — kernel shared, parity free);
  2. per conversation group, the state (sum_vec, n) is updated with the
     new mentions' score vectors — mean = sum/n stays exact because the
     row mean is algebraic, so streaming order cannot change the result;
  3. the updated mean is folded up the class tree (broadcast context,
     worker-side) and the row emitted is the conversation's CURRENT
     canonical topic.

After processing all input, per-conversation topics are exactly equal to
the batch pipeline's (tested) — the streaming operator is an incremental
view maintenance of the batch semantics, not an approximation.

State size: C+1 doubles per live conversation. ``GroupStateTimeout``
(processing-time) evicts conversations idle longer than the horizon —
the state-boundedness knob for unbounded streams.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from duke_spark.kernel.tree import PRODUCTION_TREE_AGG, aggregate_tree_scores
from duke_spark.kernel.vectors import score_against_classes

STATE_SCHEMA = "sum_scores array<double>, n bigint"

OUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("topic", T.StringType()),
    T.StructField("n_mentions", T.LongType()),
])


def _mention_scores(mentions: pd.Series, ctx) -> np.ndarray:
    groups = [m.split(" ") for m in mentions]
    vecs = ctx.embedding.embed_groups(groups)
    return score_against_classes(vecs, ctx.class_matrix).astype(np.float64)


def running_conversation_topics(mentions: DataFrame, ctx_bc,
                                idle_timeout_ms: int = 0) -> DataFrame:
    """mentions: streaming DF with (conv_id, mention) columns (from
    ``stream_triples``-style linking). Emits one row per conversation per
    micro-batch with its current topic. ``idle_timeout_ms`` > 0 evicts
    state for conversations idle that long (processing-time timeout)."""

    def update(key: Tuple[str], pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        from duke_spark.operators.linking import LinkContext  # noqa: F401
        ctx = ctx_bc.value
        if state.hasTimedOut:
            state.remove()
            return
        new_sum = None
        n_new = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            scores = _mention_scores(pdf["mention"], ctx)
            s = scores.sum(axis=0)
            new_sum = s if new_sum is None else new_sum + s
            n_new += len(pdf)
        if n_new == 0:
            return
        if state.exists:
            prev_sum, prev_n = state.get
            total = np.asarray(prev_sum, dtype=np.float64) + new_sum
            n = int(prev_n) + n_new
        else:
            total, n = new_sum, n_new
        state.update((total.tolist(), n))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        mean = total / n
        agg = aggregate_tree_scores(ctx.classes, mean, ctx.tree,
                                    PRODUCTION_TREE_AGG)
        topic = ctx.classes[int(np.argmax(agg))]
        yield pd.DataFrame({"conv_id": [key[0]], "topic": [topic],
                            "n_mentions": [n]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms > 0
               else GroupStateTimeout.NoTimeout)
    return (mentions.select("conv_id", "mention")
            .groupBy("conv_id")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", timeout))
