r"""RDF N-Triples interop for the KG: a serializing sink and a
distributed line-oriented source.

The reference's ontology input IS N-Triples — ``Duke/class_tree.py``
consumes a DBpedia ``.nt`` dump (parsed offline here by
``scripts/prepare_ontology.py``). This module generalizes that to
engine-scale: export the materialized KG as standard N-Triples (the
lingua franca for loading into triple stores / reasoners) and read
``.nt`` files distributively (one line = one triple, so a plain text
scan parallelizes perfectly — no record-spanning problem).

Serialization is PURE Catalyst (concat + regexp), no UDF:

  * subject/predicate/object become ``<urn:duke:...>`` IRIs. The
    IRIREF production forbids ``#x00-#x20 < > " { } | ^ ` \`` — those
    (plus ``%``, first, so decoding is unambiguous) are percent-encoded
    with a chained literal ``F.replace`` (JVM-side, no UDF; the KG's
    multi-word entities like ``ent:home run`` need exactly this).
    Terms containing other control characters (never legitimate in a
    normalized entity name) are SPLIT OUT for audit
    (``serialize_ntriples`` returns (lines, rejects)) — the
    refuse-don't-mangle posture of the quadratic-jaccard guard.
  * the mention score rides as an N-Triples comment suffix? No —
    comments are line-initial only; scores are emitted as a parallel
    reified relation when ``with_scores=True``: one extra line
    ``<triple-iri> <urn:duke:rel:score> "0.5"^^xsd:double .`` where the
    triple IRI is the hash of (subj, pred, obj) — the standard
    poor-man's RDF-star for edge weights.

Parsing mirrors it: ``read_ntriples`` = text scan → one regexp per
term, IRIs or quoted literals, comment/blank lines dropped. Round-trip
(serialize → write text → read → parse) is exact (tested).

At 100 TB: both directions are narrow single-pass projections over
text — no shuffle, no state; the text source splits by file/line
offsets like any Spark text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = "urn:duke:"
REL = "urn:duke:rel:"

# percent-encoding for the chars IRIREF forbids; '%' FIRST on encode,
# LAST on decode, so the mapping is bijective
_IRI_ENC = [("%", "%25"), (" ", "%20"), ("<", "%3C"), (">", "%3E"),
            ('"', "%22"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"),
            ("^", "%5E"), ("`", "%60"), ("\\", "%5C"), ("\t", "%09")]
# control chars (other than the encodable space/tab) are rejected
_CTRL = "[\x00-\x08\x0a-\x1f\x7f]"

_NT_LINE = (
    r"^\s*<([^<>\s]+)>\s+<([^<>\s]+)>\s+"
    r"(?:<([^<>\s]+)>|\"((?:[^\"\\]|\\.)*)\""
    r"(?:\^\^<([^<>\s]+)>)?)\s*\.\s*$")


def _enc(col) -> F.Column:
    for raw, pct in _IRI_ENC:
        col = F.replace(col, F.lit(raw), F.lit(pct))
    return col


def _dec(col) -> F.Column:
    for raw, pct in reversed(_IRI_ENC):
        col = F.replace(col, F.lit(pct), F.lit(raw))
    return col


def _iri(prefix: str, col) -> F.Column:
    return F.concat(F.lit("<" + prefix), _enc(col), F.lit(">"))


def serialize_ntriples(triples: DataFrame, base: str = BASE,
                       rel_base: str = REL,
                       with_scores: bool = False
                       ) -> tuple[DataFrame, DataFrame]:
    """(lines, rejects): ``lines`` has one column ``nt`` — a valid
    N-Triples line per DISTINCT (subj, pred, obj), IRI-forbidden chars
    percent-encoded; ``rejects`` carries the rows whose terms contain
    non-encodable control characters (audit, counted by caller).
    ``with_scores=True`` appends score reification lines (avg score per
    distinct triple, 6dp)."""
    t = triples.select("subj", "pred", "obj",
                       F.col("score").cast("double").alias("score")) \
        if "score" in triples.columns else \
        triples.select("subj", "pred", "obj",
                       F.lit(None).cast("double").alias("score"))
    safe = ~(F.col("subj").rlike(_CTRL) |
             F.col("pred").rlike(_CTRL) |
             F.col("obj").rlike(_CTRL))
    rejects = t.filter(~safe).select("subj", "pred", "obj")
    ok = (t.filter(safe)
          .groupBy("subj", "pred", "obj")
          .agg(F.round(F.avg("score"), 6).alias("_score")))
    line = F.concat(_iri(base, F.col("subj")), F.lit(" "),
                    _iri(rel_base, F.col("pred")), F.lit(" "),
                    _iri(base, F.col("obj")), F.lit(" ."))
    lines = ok.select(line.alias("nt"))
    if with_scores:
        # reified edge weight: subject = xxhash of the triple key
        tid = F.concat(F.lit("<" + base + "stmt:"),
                       F.lower(F.hex(F.xxhash64("subj", "pred", "obj"))),
                       F.lit(">"))
        score_lines = (ok.filter(F.col("_score").isNotNull())
                       .select(F.concat(
                           tid, F.lit(" <" + rel_base + "score> \""),
                           F.format_string("%.6f", F.col("_score")),
                           F.lit("\"^^<http://www.w3.org/2001/"
                                 "XMLSchema#double> .")).alias("nt")))
        lines = lines.unionByName(score_lines)
    return lines, rejects


def write_ntriples(triples: DataFrame, path: str,
                   with_scores: bool = False) -> int:
    """Serialize and write as line-oriented text; returns the count of
    rejected (non-IRI-safe) rows so callers can alert on lossy exports."""
    lines, rejects = serialize_ntriples(triples, with_scores=with_scores)
    lines.write.mode("overwrite").text(path)
    return rejects.count()


def read_ntriples(spark: SparkSession, path: str,
                  base: str = BASE, rel_base: str = REL) -> DataFrame:
    """Distributed N-Triples scan → (subj, pred, obj, obj_kind,
    obj_datatype). IRIs under ``base``/``rel_base`` are stripped back to
    bare terms with their percent-encoding decoded (round-trip with
    ``serialize_ntriples``); foreign IRIs are kept whole (and also
    percent-decoded — callers wanting the opaque form re-encode);
    literals keep their lexical form with standard escapes decoded.
    Blank/comment lines dropped; malformed lines surface as NULL subj
    (filterable, not silently lost)."""
    raw = spark.read.text(path)
    body = raw.filter(~F.col("value").rlike(r"^\s*(#|$)"))
    subj = F.regexp_extract("value", _NT_LINE, 1)
    pred = F.regexp_extract("value", _NT_LINE, 2)
    obj_iri = F.regexp_extract("value", _NT_LINE, 3)
    obj_lit = F.regexp_extract("value", _NT_LINE, 4)
    obj_dt = F.regexp_extract("value", _NT_LINE, 5)

    def strip(col, prefix):
        return F.when(col.startswith(prefix),
                      F.substring(col, len(prefix) + 1, 1 << 20)
                      ).otherwise(col)

    # single-pass-correct unescape: protect literal backslashes with a
    # sentinel FIRST so r"\\n" (backslash + n) doesn't decode as newline
    def unescape(c):
        c = F.regexp_replace(c, r"\\\\", "\x00")
        c = F.regexp_replace(c, r'\\"', '"')
        c = F.regexp_replace(c, r"\\n", "\n")
        c = F.regexp_replace(c, r"\\t", "\t")
        c = F.regexp_replace(c, r"\\r", "\r")
        return F.regexp_replace(c, "\x00", r"\\")
    return (body.select(
        F.when(subj == "", None).otherwise(_dec(strip(subj, base)))
         .alias("subj"),
        _dec(strip(pred, rel_base)).alias("pred"),
        F.when(obj_iri != "", _dec(strip(obj_iri, base)))
         .otherwise(unescape(obj_lit)).alias("obj"),
        F.when(obj_iri != "", F.lit("iri")).otherwise(F.lit("literal"))
         .alias("obj_kind"),
        F.when(obj_dt != "", obj_dt).alias("obj_datatype")))
