"""Embedding-based entity resolution: merge aliases of the same
real-world entity and rewrite the graph through the merge map.

Duke's canonicalization (``operators/canonical.py``, reference
``Duke/dataset_descriptor.py``) assigns each surface form a canonical
ONTOLOGY TYPE; it never decides that two distinct surface forms ARE the
same entity. At corpus scale that identity step is what keeps the KG
from fragmenting ("NYC" / "New York City" / "new york") — the classic
entity-resolution stage of any extraction pipeline.

The resolution rule here is embedding similarity, built entirely from
operators this repo already trusts:

  1. candidate pairs = ``similarity.cosine_near_dup_pairs`` (cosine ≥
     threshold inside coordinate-sign LSH buckets, hot buckets split
     into ≤max_bucket block-pair tasks — banded, never all-pairs, never
     one quadratic straggler, oracle-proven);
  2. transitive closure = ``dedup.connected_components`` (iterative
     min-label, O(diameter) rounds);
  3. canonical id = component minimum; entities with no near-dup map
     to themselves, so the returned map is TOTAL over the input.

``apply_entity_merge`` then rewrites any triple columns through the map
with per-column broadcast-friendly left joins — the map is
vertex-cardinality, orders of magnitude smaller than the fact table,
so the rewrite is two narrow-ish joins, never a shuffle of the text.
Merged facts are NOT deduplicated here (provenance rows survive);
compose with ``fact_support`` or ``distinct()`` downstream as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duke_spark.operators.dedup import connected_components
from duke_spark.operators.similarity import cosine_near_dup_pairs


def resolve_entities(vectors: DataFrame, threshold: float = 0.95,
                     num_planes: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     max_bucket: int = 4096,
                     type_col: str | None = None) -> DataFrame:
    """Total merge map (entity, canonical) over ``vectors``; canonical
    is the minimum entity id of the cosine-similarity component, the
    entity's own id when it has no neighbor ≥ threshold. ``max_bucket``
    caps the per-task pair kernel (block-pair splitting inside hot LSH
    buckets) without changing the pair set — the 100 TB guard.

    ``type_col``: optional agreement guard — candidate pairs whose
    values in this column DIFFER are discarded before the transitive
    closure, so cosine-of-label is corroborated by independent evidence
    (canonical ontology type in the KG pipeline) before two surface
    forms merge. NULL-typed entities never merge (null-rejecting
    equality, deliberately conservative: no evidence ⇒ no merge). The
    joins are vertex-cardinality against the candidate pairs."""
    pairs = cosine_near_dup_pairs(vectors, threshold=threshold,
                                  num_planes=num_planes,
                                  vec_col=vec_col, id_col=id_col,
                                  max_bucket=max_bucket)
    if type_col is not None:
        t = vectors.select(F.col(id_col), F.col(type_col))
        pairs = (pairs
                 .join(t.select(F.col(id_col).alias("a"),
                                F.col(type_col).alias("_ta")), "a")
                 .join(t.select(F.col(id_col).alias("b"),
                                F.col(type_col).alias("_tb")), "b")
                 .filter(F.col("_ta") == F.col("_tb")))
    comp = connected_components(pairs.select("a", "b"))
    return (vectors.select(F.col(id_col).alias("entity"))
            .join(comp.withColumnRenamed("node", "entity"),
                  "entity", "left")
            .select("entity",
                    F.coalesce("comp", F.col("entity"))
                    .alias("canonical")))


def apply_entity_merge(triples: DataFrame, merge_map: DataFrame,
                       cols: tuple = ("subj", "obj")) -> DataFrame:
    """Rewrite ``cols`` of ``triples`` through the (entity, canonical)
    map; ids absent from the map pass through unchanged. One left join
    per column against the (small) map — Catalyst broadcasts it."""
    out = triples
    for c in cols:
        m = merge_map.select(F.col("entity").alias(c),
                             F.col("canonical").alias(f"_canon_{c}"))
        out = (out.join(m, c, "left")
               .withColumn(c, F.coalesce(f"_canon_{c}", F.col(c)))
               .drop(f"_canon_{c}"))
    return out


def resolve_kg_entities(triples: DataFrame, ctx_bc, threshold: float,
                        num_planes: int = 4, prefix: str = "ent:",
                        max_bucket: int = 4096,
                        type_guard: bool = False) -> tuple:
    """Pipeline form: resolve the KG's OWN entities using the link
    context's word embeddings, and rewrite the triples.

    Steps, all vertex-cardinality until the final rewrite: collect the
    distinct ``prefix``-terms from subj/obj, embed each label with the
    broadcast context (one mapInPandas batch gather — the same matrix
    the linker scored against, so "similar" means similar in the
    linking space), index them densely (ids must be integral for the
    pair kernel), run ``resolve_entities``, translate the id map back
    to term strings, and ``apply_entity_merge``. Returns
    (merge_map_df with (entity, canonical) STRING terms, rewritten
    triples). Labels missing from the embedding vocabulary map to
    themselves (no vector ⇒ no merge evidence).

    ``type_guard``: corroborate cosine with canonicalization (B6,
    reference ``Duke/dataset_descriptor.py:65-80``): each label's class
    scores fold up the ontology tree with the production agg and two
    labels may only merge when their argmax canonical types AGREE — a
    high-cosine pair of a person-name and a place-name stays split.
    Computed in the same embed pass (one extra matmul against the class
    matrix per batch; vertex-cardinality)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from duke_spark.operators.kg_train import dense_entity_index

    # one scan, not a self-union: explode([subj, obj]) enumerates both
    # positions from a single pass over the fact table (the distinct
    # output is vertex-sized either way, but the union form scanned the
    # 100 TB side twice)
    terms = (triples
             .select(F.explode(F.array("subj", "obj")).alias("t"))
             .filter(F.col("t").startswith(prefix)).distinct())
    idx = dense_entity_index(terms, col="t")  # (entity=str, idx)

    fields = [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
    if type_guard:
        fields.append(T.StructField("ctype", T.StringType()))
    vec_schema = T.StructType(fields)
    plen = len(prefix)

    def embed(batches):
        from duke_spark.kernel.tree import (PRODUCTION_TREE_AGG,
                                            aggregate_tree_scores)
        from duke_spark.kernel.vectors import score_against_classes
        ctx = ctx_bc.value
        emb = ctx.embedding
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # multi-word labels split into word groups, exactly how the
            # linker embeds class names (linking.py c.split(" ")) — a
            # whole multi-word label is never itself a vocab token
            groups = [lbl[plen:].split(" ") for lbl in pdf["entity"]]
            keep = pd.Series([emb.in_vocab(g) for g in groups],
                             index=pdf.index)
            if not keep.any():
                continue
            sub = pdf[keep]
            vecs = emb.embed_groups([g for g, k in zip(groups, keep)
                                     if k])
            out = {"vec_id": sub["idx"].to_numpy(),
                   "embedding": [[float(x) for x in v] for v in vecs]}
            if type_guard:
                # single-occurrence canonicalization of the surface
                # form itself: score → tree fold → argmax class
                scores = score_against_classes(vecs, ctx.class_matrix)
                out["ctype"] = [
                    ctx.classes[int(np.argmax(aggregate_tree_scores(
                        ctx.classes, s, ctx.tree, PRODUCTION_TREE_AGG)))]
                    for s in scores]
            yield pd.DataFrame(out)

    # persist: the embed pass (the pipeline's dominant matmul, plus the
    # tree fold under type_guard) fans out to several plan branches —
    # the pair kernel scans it twice (bucket counts + rows), the type
    # guard twice more (a/b-side joins), and the total-map tail once;
    # uncached it would re-embed every label ~5x. Unpersisted below
    # once str_map is materialized.
    vectors = idx.mapInPandas(embed, schema=vec_schema).persist()
    id_map = resolve_entities(vectors, threshold=threshold,
                              num_planes=num_planes,
                              max_bucket=max_bucket,
                              type_col="ctype" if type_guard else None)
    # ids → term strings (two joins against the vertex-sized index)
    a = idx.select(F.col("idx").alias("entity"),
                   F.col("entity").alias("ent_str"))
    b = idx.select(F.col("idx").alias("canonical"),
                   F.col("entity").alias("canon_str"))
    str_map = (id_map.join(a, "entity").join(b, "canonical")
               .filter(F.col("ent_str") != F.col("canon_str"))
               .select(F.col("ent_str").alias("entity"),
                       F.col("canon_str").alias("canonical"))
               .persist())
    # materialize the (vertex-sized) map once: the rewrite joins it per
    # column, and callers typically write both the map and the rewrite —
    # without this the embed+CC pipeline would re-run per consumer
    n_merges = str_map.count()
    vectors.unpersist()
    idx.unpersist()
    # empty map ⇒ the rewrite is the identity: skip the per-column joins
    # (and let callers skip re-materializing the fact table — at 100 TB
    # an identity copy of the triples is the most expensive no-op in the
    # pipeline). The count is already in hand from the persist above.
    if n_merges == 0:
        return str_map, triples
    return str_map, apply_entity_merge(triples, str_map)
