"""Ontology sources: A19 class-name normalize, A4 NT → tree prep, and the
real DBpedia 788-class tree flowing through the KG canonicalization path."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from duke_spark.sources.ontology import (REFERENCE_TREE_PATH,
                                         build_class_tree, load_dbpedia_tree,
                                         ontology_vocab_words,
                                         parse_nt_ontology, to_class_name)

NT_FIXTURE = """\
# synthetic DBpedia-style ontology slice
<http://dbpedia.org/ontology/SportsEvent> <http://www.w3.org/2000/01/rdf-schema#label> "SportsEvent"@en .
<http://dbpedia.org/ontology/SportsEvent> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://dbpedia.org/ontology/Event> .
<http://dbpedia.org/ontology/Event> <http://www.w3.org/2000/01/rdf-schema#label> "Ereignis"@de .
<http://dbpedia.org/ontology/Event> <http://www.w3.org/2000/01/rdf-schema#label> "event"@en .
<http://dbpedia.org/ontology/RoadJunction> <http://www.w3.org/2000/01/rdf-schema#label> "road-junction"@en .
<http://dbpedia.org/ontology/RoadJunction> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://dbpedia.org/ontology/Place> .
<http://dbpedia.org/ontology/Place> <http://www.w3.org/2000/01/rdf-schema#label> "place (location)"@en .
<http://dbpedia.org/ontology/Lonely> <http://www.w3.org/2000/01/rdf-schema#label> "lonely"@en .
"""


def test_to_class_name_matches_reference_rule():
    # underscore(CamelCase) then _/- → spaces, parens removed
    # (Duke/class_tree.py:105-115, Duke/utils.py:8-9)
    assert to_class_name("SportsEvent") == "sports event"
    assert to_class_name("Athlete") == "athlete"
    assert to_class_name("road-junction") == "road junction"
    assert to_class_name("place (location)") == "place location"
    assert to_class_name("MeanOfTransportation") == "mean of transportation"
    assert to_class_name("TimePeriod") == "time period"


def test_nt_prep_builds_expected_tree(tmp_path):
    nt = tmp_path / "onto.nt"
    nt.write_text(NT_FIXTURE)
    classes = parse_nt_ontology(str(nt))
    tree = build_class_tree(classes)
    assert tree["sports event"] == {"parents": ["event"], "children": []}
    assert tree["event"] == {"parents": [], "children": ["sports event"]}
    # en label preferred over de
    assert "ereignis" not in tree
    assert tree["road junction"]["parents"] == ["place location"]
    assert tree["lonely"] == {"parents": [], "children": []}

    pruned = build_class_tree(classes, prune=True)
    assert "lonely" not in pruned and "event" in pruned


def test_prepare_ontology_cli(tmp_path):
    nt = tmp_path / "onto.nt"
    nt.write_text(NT_FIXTURE)
    out = tmp_path / "tree.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/prepare_ontology.py"),
         str(nt), "-o", str(out), "--prune"],
        check=True, capture_output=True)
    tree = json.loads(out.read_text())
    assert set(tree) == {"sports event", "event",
                         "road junction", "place location"}


needs_reference = pytest.mark.skipif(
    not os.path.exists(REFERENCE_TREE_PATH),
    reason="reference DBpedia tree not present")


@needs_reference
def test_real_dbpedia_tree_loads():
    tree = load_dbpedia_tree()
    assert len(tree) == 788
    assert tree["athlete"]["parents"] == ["person"]
    assert "baseball player" in tree["athlete"]["children"]


@needs_reference
def test_canonical_types_from_real_tree(spark):
    """KG canonicalization over the REAL 788-class DBpedia tree: the
    embedding vocabulary covers every class word, so OOV normalization
    keeps all 788 classes and the tree fold runs the true hierarchy."""
    import pandas as pd
    from duke_spark.fixtures.embedding import embedding_arrays
    from duke_spark.fixtures.transcripts import spark_transcripts
    from duke_spark.operators.canonical import canonical_types
    from duke_spark.operators.mentions import linked_mentions
    from duke_spark.pipeline import make_context

    raw_tree = load_dbpedia_tree()
    words = ontology_vocab_words(raw_tree)
    vocab, matrix = embedding_arrays(vocab=words)
    ctx_bc = make_context(spark, vocab=vocab, matrix=matrix,
                          raw_tree=raw_tree)
    assert len(ctx_bc.value.classes) == 788  # nothing dropped as OOV

    pdf = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": np.array([0, 1, 0], dtype=np.int32),
        "role": ["user", "assistant", "user"],
        "text": ["the athlete won the race",
                 "a baseball player joined the team",
                 "the river crosses the city"],
        "tool": [None, None, None],
        "ts": pd.to_datetime(["2026-01-01"] * 3),
    })
    mentions = linked_mentions(spark_transcripts(spark, pdf), ctx_bc)
    out = canonical_types(mentions, ctx_bc)
    assert len(out) > 0
    # canonical types are real DBpedia classes
    assert set(out["canonical_type"]) <= set(raw_tree)
    # a class-word mention links to itself, and its canonical type is a
    # member of its own subtree-or-self (the fold can promote a parent)
    ent = dict(zip(out["entity"], out["canonical_type"]))
    assert "athlete" in ent
