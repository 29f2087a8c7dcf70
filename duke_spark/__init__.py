"""duke_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the query/data-processing capabilities of
uncharted-distil/duke (reference at /root/reference, cited as path:line in
docstrings) re-expressed Spark-first: DataFrame/Catalyst for everything
relational, exactly three vectorized pandas-UDF kernels (mention/triple
extraction, embed+link matmul, eval metrics), broadcast embedding matrix,
salted/skew-aware shuffles, and checkpointed, resumable batch output.

Layout:
  kernel/     pure-NumPy/regex kernels (no Spark): text normalize, vectors,
              class-tree aggregation, mini-Duke oracle
  fixtures/   deterministic synthetic inputs: mini-wiki2vec embedding,
              mini class tree, transcript generator (skew knob)
  sources/    schema-first readers for transcripts + testdata tables
  operators/  Spark operators: mentions, linking, canonicalization, graph,
              dedup, similarity, text analysis, multimodal plumbing
  plans/      checkpoint/lineage/resume + metrics
  streaming/  Structured Streaming variants
"""

__version__ = "0.2.0"
