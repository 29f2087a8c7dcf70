"""Benchmark-contamination detection: flag training documents sharing
word n-grams with an evaluation/benchmark set.

The standard pretraining hygiene check (n-gram collision against held-out
benchmarks) as a Spark join: benchmark texts → distinct shingles (tiny —
benchmarks are MBs, corpora are TBs) broadcast against the corpus's
exploded distinct shingles; per-doc overlap counts left-joined back so
every document gets a row. One broadcast join + one hash aggregate; the
corpus side is never shuffled on data volume, only on doc_id for the
count. Shingle rule matches ``dedup.with_shingles`` (degenerate short
texts become one whole-text shingle), so the DuckDB oracle reproduces the
flags exactly.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duke_spark.operators.dedup import with_shingles


def contamination_flags(docs: DataFrame,
                        benchmark: Union[DataFrame, Sequence[str]],
                        n: int = 3, min_overlap: int = 1,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, n_overlap, contaminated) for every document. ``benchmark`` is
    a DataFrame with ``text_col`` or a plain list of strings."""
    if not isinstance(benchmark, DataFrame):
        spark = docs.sparkSession
        benchmark = spark.createDataFrame(
            [(t,) for t in benchmark], schema=f"{text_col} string")
    bench_sh = (with_shingles(benchmark.select(text_col), text_col, n=n)
                .select(F.explode(F.array_distinct("shingles"))
                        .alias("s"))
                .distinct())
    doc_sh = (with_shingles(docs.select(id_col, text_col), text_col, n=n)
              .select(id_col, F.explode(F.array_distinct("shingles"))
                      .alias("s")))
    overlap = (doc_sh.join(F.broadcast(bench_sh), "s")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    return (docs.select(id_col)
            .join(overlap, id_col, "left")
            .select(id_col,
                    F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
                    .alias("contaminated")))
