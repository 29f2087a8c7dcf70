"""Spark operators: KG construction (mentions/linking/triples/canonical/graph)
plus training-data-pipeline operators (dedup, similarity, text analysis,
multimodal plumbing)."""
