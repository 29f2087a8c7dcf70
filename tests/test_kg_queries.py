"""KG query helpers over the materialized graph."""

import pytest
from pyspark.sql import functions as F

from duke_spark.operators.kg_queries import (conversations_about,
                                             entity_neighbors,
                                             tool_usage, top_entities,
                                             type_distribution)
from duke_spark.pipeline import build_kg


@pytest.fixture(scope="module")
def kg(spark, tiny_transcripts, ctx_bc):
    out = build_kg(spark, tiny_transcripts, ctx_bc)
    out["vertices"] = out["vertices"].persist()
    out["edges"] = out["edges"].persist()
    yield out
    out["mentions"].unpersist()
    out["vertices"].unpersist()
    out["edges"].unpersist()


def test_type_distribution(kg):
    dist = type_distribution(kg["vertices"]).toPandas()
    n_ents = kg["vertices"].filter(F.col("kind") == "ent").count()
    assert dist["n_entities"].sum() == n_ents
    assert dist["n_entities"].is_monotonic_decreasing


def test_top_entities(kg):
    top = top_entities(kg["vertices"], kg["edges"], k=5).toPandas()
    assert 0 < len(top) <= 5
    assert top["total_weight"].is_monotonic_decreasing
    assert top["id"].str.startswith("ent:").all()
    assert top["canonical_type"].notna().all()


def test_entity_neighbors_and_conversations(kg):
    top = top_entities(kg["vertices"], kg["edges"], k=1).toPandas()
    label = top["label"].iloc[0]
    nbrs = entity_neighbors(kg["edges"], label).toPandas()
    assert (nbrs["rel"] == "co_mentioned").all()
    assert nbrs["neighbor"].str.startswith("ent:").all()
    assert nbrs["weight"].is_monotonic_decreasing
    convs = conversations_about(kg["edges"], label).toPandas()
    assert len(convs) > 0
    assert convs["conv"].str.startswith("conv:").all()
    # reverse index is consistent with the mention edges themselves
    n_edges = kg["edges"].filter(
        (F.col("rel") == "mentions") &
        (F.col("dst") == f"ent:{label}")).count()
    assert len(convs) == min(n_edges, 20)


def test_tool_usage(kg):
    tools = tool_usage(kg["edges"]).toPandas()
    assert tools["tool"].str.startswith("tool:").all()
    n_tool_edges = kg["edges"].filter(F.col("rel") == "used_tool") \
        .agg(F.sum("n")).collect()[0][0]
    assert tools["n_uses"].sum() == n_tool_edges
