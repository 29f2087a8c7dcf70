"""Graph materialization (SURVEY B7): vertices + edges DataFrames from
triples and canonical types. GraphFrames-compatible column names
(id/src/dst) but plain DataFrames — no extra dependency.

Spec:
  vertices: id, label, kind(ent|conv|tool), canonical_type, score
    - ent:X   label=X, canonical_type from B6, score=avg(entity_score)
    - conv:C  label=C, canonical_type = canonical type of the entity with
              the highest total score in the conversation (ties → entity
              name desc, i.e. max on the (score, name) pair), score=avg
    - tool:T  label=T, canonical_type=null, score=null
  edges: src, dst, rel, weight=sum(score), n=count — aggregated from
    triples (the top-k emission analogue of Duke's
    ``dataset_descriptor.py:91-97`` generalized to edge weights).

All joins against canonical types are broadcast (≤788 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_edges(triples: DataFrame) -> DataFrame:
    return (triples
            .groupBy(F.col("subj").alias("src"),
                     F.col("pred").alias("rel"),
                     F.col("obj").alias("dst"))
            .agg(F.sum("score").alias("weight"),
                 F.count(F.lit(1)).alias("n"))
            .select("src", "dst", "rel", "weight", "n"))


def build_vertices(mentions: DataFrame, canonical: DataFrame) -> DataFrame:
    """mentions = linked-mention DF; canonical = (entity, canonical_type,
    n_mentions) DF (small → broadcast)."""
    canon = F.broadcast(canonical.select("entity", "canonical_type"))

    ents = (mentions.groupBy("entity")
            .agg(F.avg("entity_score").alias("score"))
            .join(canon, "entity", "left")
            .select(F.concat(F.lit("ent:"), F.col("entity")).alias("id"),
                    F.col("entity").alias("label"),
                    F.lit("ent").alias("kind"),
                    "canonical_type", "score"))

    # conv canonical type = type of its dominant entity: max on the
    # (total score, entity name) pair, so ties break deterministically
    conv_ent = (mentions.groupBy("conv_id", "entity")
                .agg(F.sum("entity_score").alias("tot"),
                     F.avg("entity_score").alias("avg_s")))
    dominant = (conv_ent.groupBy("conv_id")
                .agg(F.expr("max_by(entity, struct(tot, entity))")
                     .alias("entity")))
    convs = (mentions.groupBy("conv_id")
             .agg(F.avg("entity_score").alias("score"))
             .join(dominant, "conv_id", "left")
             .join(canon, "entity", "left")
             .select(F.concat(F.lit("conv:"), F.col("conv_id")).alias("id"),
                     F.col("conv_id").alias("label"),
                     F.lit("conv").alias("kind"),
                     "canonical_type", "score"))

    tools = (mentions.filter(F.col("tool").isNotNull())
             .select("tool").distinct()
             .select(F.concat(F.lit("tool:"), F.col("tool")).alias("id"),
                     F.col("tool").alias("label"),
                     F.lit("tool").alias("kind"),
                     F.lit(None).cast("string").alias("canonical_type"),
                     F.lit(None).cast("double").alias("score")))

    return ents.unionByName(convs).unionByName(tools)


# --- graph analytics over the materialized KG ------------------------------

def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_deg, in_deg, degree) per vertex — two hash aggregates
    merged with a full outer join (every id that appears anywhere)."""
    out_d = edges.groupBy(F.col("src").alias("id")) \
        .agg(F.count(F.lit(1)).alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("id")) \
        .agg(F.count(F.lit(1)).alias("in_deg"))
    return (out_d.join(in_d, "id", "full_outer")
            .select("id",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"))
            .withColumn("degree", F.col("out_deg") + F.col("in_deg")))


def two_hop_neighbors(edges: DataFrame, max_paths_per_mid: int = 10000
                      ) -> DataFrame:
    """Distinct (a, c) pairs connected via some b (a→b→c, a ≠ c) with the
    path count — the basic motif query. One self-join keyed on the
    middle vertex; ``max_paths_per_mid`` caps the fan-out the same way
    the shingle df-cap does (a hub vertex of degree d contributes d²
    paths, so hubs above the cap are excluded rather than detonating the
    join — standard practice for web-scale motif counting)."""
    deg = (edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d_in"))
           .filter(F.col("d_in") <= max_paths_per_mid)
           .select(F.col("dst").alias("mid")))
    left = (edges.join(deg, edges.dst == deg.mid)
            .select(F.col("src").alias("a"), F.col("dst").alias("b")))
    right = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return (left.join(right, "b")
            .filter(F.col("a") != F.col("c"))
            .groupBy("a", "c")
            .agg(F.count(F.lit(1)).alias("n_paths")))


def shortest_paths(edges: DataFrame, sources, max_hops: int = 10,
                   directed: bool = True) -> DataFrame:
    """(id, distance) — hop distance from the NEAREST of ``sources``
    (multi-source BFS), unreachable vertices omitted. The standard
    iterative-frontier shape: per hop, frontier ⋈ edges → candidate
    neighbors at d+1, anti-join against already-settled vertices,
    ``localCheckpoint`` to truncate lineage; early-stop on an empty
    frontier (a count over the just-checkpointed frontier — a narrow
    scan, not a recompute). O(max_hops) shuffles, frontier-sized — the
    same bill as any BFS; for diameter-bounded KG neighborhoods
    ``max_hops`` keeps it finite on pathological graphs."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        e = e.union(edges.select(F.col("dst").alias("u"),
                                 F.col("src").alias("v")))
    e = e.distinct().persist()
    spark = edges.sparkSession
    settled = (spark.createDataFrame([(s,) for s in sources], ["id"])
               .distinct()
               .withColumn("distance", F.lit(0)).localCheckpoint())
    frontier = settled
    for hop in range(1, max_hops + 1):
        nbrs = (frontier.join(e, frontier.id == e.u)
                .select(F.col("v").alias("id"))
                .distinct()
                .join(settled.select("id"), "id", "left_anti")
                .withColumn("distance", F.lit(hop))
                .localCheckpoint())
        if nbrs.isEmpty():
            break
        settled = settled.unionByName(nbrs).localCheckpoint()
        frontier = nbrs
    e.unpersist()
    return settled


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             weight_col: str | None = None) -> DataFrame:
    """(id, rank) by power iteration — the standard iterative-join shape
    (contributions = rank/out_deg shuffled to dst, damped sum, repeat),
    with ``localCheckpoint`` per round to truncate lineage like
    ``dedup.connected_components``. Dangling mass is redistributed
    uniformly so ranks sum to the vertex count at every step.

    One Spark job per iteration: the dangling mass is derived from the
    SAME contributions aggregate (Σ contrib over all dst == Σ rank over
    vertices with out-edges, since per-src fracs sum to 1), broadcast as
    a 1-row total into the update plan — no separate driver ``collect``.
    The contributions shuffle is shared between the total and the join
    (ReuseExchange), so it is computed once."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    out_w = (edges.groupBy("src").agg(F.sum(w).alias("out_w")))
    norm = (edges.select("src", "dst", w.alias("w"))
            .join(out_w, "src")
            .select("src", "dst", (F.col("w") / F.col("out_w"))
                    .alias("frac")).persist())
    verts = (edges.select(F.col("src").alias("id"))
             .union(edges.select(F.col("dst").alias("id")))
             .distinct().persist())
    n = verts.count()
    ranks = verts.withColumn("rank", F.lit(1.0)).localCheckpoint()
    for _ in range(iters):
        contribs = (norm.join(ranks.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum(F.col("frac") * F.col("rank"))
                         .alias("contrib")))
        tot = contribs.agg(F.sum("contrib").alias("_tot"))
        dangling = ((F.lit(float(n)) - F.coalesce("_tot", F.lit(0.0)))
                    / F.lit(float(n)))
        ranks = (verts.join(contribs, "id", "left")
                 .crossJoin(F.broadcast(tot))
                 .select("id",
                         (F.lit(1.0 - damping) + F.lit(damping) *
                          (F.coalesce("contrib", F.lit(0.0)) +
                           dangling)).alias("rank"))
                 .localCheckpoint())
    norm.unpersist()
    verts.unpersist()
    return ranks


def entity_timeline(triples: DataFrame, turns: DataFrame) -> DataFrame:
    """(entity, first_seen, last_seen, n_convs, n_mentions) — temporal KG
    attributes per entity: when it first/last appears and how broadly
    (the validity-interval signal temporal-KG stores attach to vertices;
    the reference has no time axis — this generalizes its per-dataset
    summary to the transcript payload's ``ts`` column).

    One equi-join of mention triples back to the turn table on
    (conv_id, turn_idx) — BOTH sides are projected to fixed-width
    columns first (the turn side drops ``text`` before the exchange, so
    the payload bytes never shuffle), then one hash agg per entity.
    count_distinct(conv_id) is the only expansion: Spark rewrites it as
    a two-phase expand+agg, still map-side partial. At 10^12 turns the
    join is the same shape as the extraction itself (keyed on conv_id),
    so AQE's skew handling covers hot conversations."""
    m = (triples.filter(F.col("pred") == "mentions")
         .select("conv_id", "turn_idx", F.col("obj").alias("entity")))
    t = turns.select("conv_id", "turn_idx", "ts")
    return (m.join(t, ["conv_id", "turn_idx"])
            .groupBy("entity")
            .agg(F.min("ts").alias("first_seen"),
                 F.max("ts").alias("last_seen"),
                 F.countDistinct("conv_id").alias("n_convs"),
                 F.count(F.lit(1)).alias("n_mentions")))


def entity_cooccurrence_pmi(triples: DataFrame, min_pairs: int = 1,
                            max_entities_per_conv: int = 10000
                            ) -> DataFrame:
    """(ent_a, ent_b, n_pairs, pmi) — pointwise mutual information of
    entity pairs co-mentioned in the same conversation, the standard
    edge-weighting signal for KG densification (generalizes the flat
    ``co_mentioned`` count the triple extractor already emits).

    PMI = ln(P(a,b) / (P(a)·P(b))) with conversation-level events over
    ONE coherent event space: conversations with at most
    ``max_entities_per_conv`` distinct entities (the same fan-out guard
    as ``two_hop_neighbors`` — a conv with E entities contributes E²
    self-join rows). Pairs, per-entity marginals, AND the N-convs total
    all come from that same bounded relation, so P(a,b) and P(a)·P(b)
    are probabilities of the same universe and PMI stays unbiased when
    the cap binds (with no hub convs the cap is a no-op and the numbers
    equal the unbounded definition — the oracle's case). The N-total is
    cross-joined as a broadcast 1-row frame (no driver action); the
    marginal joins broadcast when the entity vocab is small, AQE
    decides otherwise. Floats rounded to 6dp (repo cross-engine policy).

    Caching: the deduplicated (conv, entity) relation fans out to four
    plan branches (self-join ×2, marginals, total), and recomputing the
    upstream triple extraction (pandas-UDF matmul) per branch would
    multiply the pipeline's dominant cost — so it is persisted, the
    RESULT is persisted and materialized, and the intermediate is
    unpersisted before returning (match_path discipline). The caller
    owns the returned cache: ``out.unpersist()`` when done."""
    ents = (triples.filter(F.col("pred") == "mentions")
            .select("conv_id", F.col("obj").alias("entity"))
            .distinct().persist())
    sizes = (ents.groupBy("conv_id")
             .agg(F.count(F.lit(1)).alias("_n_ent"))
             .filter(F.col("_n_ent") <= max_entities_per_conv)
             .select("conv_id"))
    bounded = ents.join(sizes, "conv_id")
    pairs = (bounded.alias("l")
             .join(bounded.alias("r"), "conv_id")
             .filter(F.col("l.entity") < F.col("r.entity"))
             .groupBy(F.col("l.entity").alias("ent_a"),
                      F.col("r.entity").alias("ent_b"))
             .agg(F.count(F.lit(1)).alias("n_pairs"))
             .filter(F.col("n_pairs") >= min_pairs))
    marg = bounded.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_convs"))
    total = sizes.agg(F.count(F.lit(1)).alias("n_total"))
    out = (pairs
           .join(marg.select(F.col("entity").alias("ent_a"),
                             F.col("n_convs").alias("_na")), "ent_a")
           .join(marg.select(F.col("entity").alias("ent_b"),
                             F.col("n_convs").alias("_nb")), "ent_b")
           .crossJoin(F.broadcast(total))
           .select("ent_a", "ent_b", "n_pairs",
                   F.round(F.log(F.col("n_pairs").cast("double") *
                                 F.col("n_total") /
                                 (F.col("_na").cast("double") *
                                  F.col("_nb"))), 6).alias("pmi"))
           .persist())
    out.count()
    ents.unpersist()
    return out
