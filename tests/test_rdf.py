"""N-Triples interop (operators.rdf): serialization grammar, reject
split, score reification, write→read round-trip, foreign-file parsing,
and escape decoding."""

import pandas as pd
from pyspark.sql import functions as F

from duke_spark.operators.rdf import (read_ntriples, serialize_ntriples,
                                      write_ntriples)


def _triples(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj",
                                    "pred", "obj", "score"]))


def test_serialize_grammar_and_dedup(spark):
    t = _triples(spark, [
        ("a", 0, "conv:a", "mentions", "ent:x", 0.5),
        ("a", 1, "conv:a", "mentions", "ent:x", 0.7),  # same triple
        ("a", 1, "conv:a", "used_tool", "tool:t_1", 1.0),
    ])
    lines, rejects = serialize_ntriples(t)
    got = sorted(r.nt for r in lines.collect())
    assert got == [
        "<urn:duke:conv:a> <urn:duke:rel:mentions> <urn:duke:ent:x> .",
        "<urn:duke:conv:a> <urn:duke:rel:used_tool> <urn:duke:tool:t_1> .",
    ]
    assert rejects.count() == 0


def test_serialize_percent_encodes_iri_forbidden_chars(spark):
    """Multi-word entities (the KG's own vocab) and IRIREF-forbidden
    punctuation are percent-encoded, '%' first so decoding is
    unambiguous; only control characters reject."""
    t = _triples(spark, [
        ("a", 0, "conv:a", "mentions", "ent:home run", 0.5),
        ("a", 0, "conv:a", "mentions", "ent:50%<off>", 0.5),
        ("a", 0, "conv:a", "mentions", "ent:ctrl\x01char", 0.5),
    ])
    lines, rejects = serialize_ntriples(t)
    got = sorted(r.nt for r in lines.collect())
    assert got == [
        "<urn:duke:conv:a> <urn:duke:rel:mentions> "
        "<urn:duke:ent:50%25%3Coff%3E> .",
        "<urn:duke:conv:a> <urn:duke:rel:mentions> "
        "<urn:duke:ent:home%20run> .",
    ]
    assert [r.obj for r in rejects.collect()] == ["ent:ctrl\x01char"]


def test_roundtrip_percent_encoding(spark, tmp_path):
    t = _triples(spark, [
        ("a", 0, "conv:a", "mentions", "ent:home run", 0.5),
        ("a", 0, "conv:a", "mentions", "ent:50%<off>", 0.5),
    ])
    path = str(tmp_path / "kg.nt")
    assert write_ntriples(t, path) == 0
    got = {r.obj for r in read_ntriples(spark, path).collect()}
    assert got == {"ent:home run", "ent:50%<off>"}


def test_score_reification(spark):
    t = _triples(spark, [
        ("a", 0, "conv:a", "mentions", "ent:x", 0.25),
        ("a", 1, "conv:a", "mentions", "ent:x", 0.75),
    ])
    lines, _ = serialize_ntriples(t, with_scores=True)
    got = sorted(r.nt for r in lines.collect())
    assert len(got) == 2
    score_line = [ln for ln in got if "rel:score" in ln][0]
    # avg(0.25, 0.75) = 0.5, xsd:double-typed literal
    assert '"0.500000"^^<http://www.w3.org/2001/XMLSchema#double> .' \
        in score_line
    assert score_line.startswith("<urn:duke:stmt:")


def test_write_read_roundtrip(spark, tmp_path):
    t = _triples(spark, [
        ("a", 0, "conv:a", "mentions", "ent:x", 0.5),
        ("a", 1, "conv:a", "co_mentioned", "ent:y", 0.5),
        ("b", 0, "conv:b", "used_tool", "tool:t", 1.0),
    ])
    path = str(tmp_path / "kg.nt")
    n_rejected = write_ntriples(t, path)
    assert n_rejected == 0
    back = read_ntriples(spark, path)
    got = {(r.subj, r.pred, r.obj, r.obj_kind) for r in back.collect()}
    want = {(r.subj, r.pred, r.obj, "iri")
            for r in t.select("subj", "pred", "obj").distinct().collect()}
    assert got == want


def test_read_foreign_nt_literals_and_escapes(spark, tmp_path):
    """A hand-written .nt file exercising comments, blanks, foreign
    IRIs, typed/plain literals, escape decoding (incl. the \\\\n
    backslash-then-n case), and a malformed line surfacing as NULL."""
    content = "\n".join([
        "# a comment",
        "",
        "<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .",
        '<http://ex.org/s> <http://ex.org/name> "Alice \\"A\\"" .',
        '<http://ex.org/s> <http://ex.org/note> "line1\\nline2" .',
        '<http://ex.org/s> <http://ex.org/raw> "back\\\\nslash" .',
        '<http://ex.org/s> <http://ex.org/age> '
        '"42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        "this line is not a triple",
    ])
    p = tmp_path / "foreign.nt"
    p.write_text(content)
    out = read_ntriples(spark, str(p))
    rows = {r.pred: r for r in out.filter(F.col("subj").isNotNull())
            .collect()}
    assert rows["http://ex.org/p"].obj == "http://ex.org/o"
    assert rows["http://ex.org/p"].obj_kind == "iri"
    assert rows["http://ex.org/name"].obj == 'Alice "A"'
    assert rows["http://ex.org/note"].obj == "line1\nline2"
    assert rows["http://ex.org/raw"].obj == "back\\nslash"
    age = rows["http://ex.org/age"]
    assert age.obj == "42" and age.obj_kind == "literal"
    assert age.obj_datatype == "http://www.w3.org/2001/XMLSchema#integer"
    assert out.filter(F.col("subj").isNull()).count() == 1


def test_roundtrip_adversarial_corpus(spark, tmp_path):
    """One write→read cycle over a corpus built to break the encoding:
    pre-encoded-looking text ('%20' must NOT decode to a space it never
    was), '%' runs, every encodable char, mixes, tabs, backslash
    sequences, unicode (legal in IRIs, passes through raw)."""
    objs = ["ent:%20", "ent:%%25%", "ent:a b c", "ent:<>{}|^`",
            "ent:back\\slash", "ent:\\n", "ent:tab\there",
            "ent:naïve-café", "ent:日本語", "ent:%", "ent: ",
            "ent:a%2 0b", "ent:.~-_", "ent:%255"]
    t = _triples(spark, [("a", 0, "conv:a", "mentions", o, 0.5)
                         for o in objs])
    path = str(tmp_path / "adv.nt")
    assert write_ntriples(t, path) == 0
    got = sorted(r.obj for r in read_ntriples(spark, path).collect())
    assert got == sorted(objs)


def test_roundtrip_strips_base_prefixes(spark, tmp_path):
    t = _triples(spark, [("a", 0, "conv:a", "mentions", "ent:x", 0.5)])
    path = str(tmp_path / "kg.nt")
    write_ntriples(t, path)
    row = read_ntriples(spark, path).collect()[0]
    assert (row.subj, row.pred, row.obj) == ("conv:a", "mentions", "ent:x")
