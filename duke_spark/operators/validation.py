"""SHACL-lite graph validation — declarative integrity constraints over
the KG triple relation, violations materialized as a DataFrame.

A production KG build needs a quality gate between extraction and
publication: malformed IRIs, vocabulary drift, self-loops, and
cardinality blow-ups are exactly the defects that silently poison
downstream joins at 100 TB. This is the SHACL idea (shapes constraining
an RDF graph, violations as a report graph) reduced to the constraint
kinds that compile to single Catalyst passes — no recursion, no paths.

``shapes`` maps predicate -> constraint dict with any of:

  * ``subject_prefix`` / ``object_prefix`` — term "datatype" check
    (IRI-scheme discipline, e.g. mentions must go conv:* -> ent:*);
  * ``irreflexive: True`` — subj != obj (self-loops are extraction
    artifacts in a co-occurrence graph);
  * ``subject_in: (other_pred, "subj"|"obj")`` — referential domain:
    every subject must appear at that position of the other predicate
    (e.g. a tool-using entity must actually be mentioned somewhere);
  * ``max_distinct_objects: k`` — cardinality bound per subject
    (functional predicates, hub explosions).

``closed=True`` additionally flags every triple whose predicate is not
in ``shapes`` (closed vocabulary — SHACL's sh:closed).

Null/empty subj or obj is always a violation, shape or not.

Output: one row per (rule, violating triple), schema
(rule:string, pred, subj, obj), DISTINCT per rule. Compilation is pure
Catalyst: prefix/null/irreflexive rules are predicate filters fused
into one scan each; ``subject_in`` is a LEFT ANTI join against the
DISTINCT term set of the referenced position (keys-only exchange);
``max_distinct_objects`` is one groupBy + HAVING re-joined to the
offending triples. At scale every rule is either a narrow filter or a
single bounded shuffle — nothing is quadratic in the graph.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT = ("rule", "pred", "subj", "obj")


def _report(df: DataFrame, rule: str) -> DataFrame:
    return (df.select(F.lit(rule).alias("rule"), "pred", "subj", "obj")
            .distinct())


def validate_graph(triples: DataFrame,
                   shapes: dict[str, dict],
                   closed: bool = False) -> DataFrame:
    """See module docstring. Returns the violation report DataFrame;
    empty (not None) when the graph conforms."""
    base = triples.select("subj", "pred", "obj")
    reports: list[DataFrame] = []

    # pred participates too: a NULL/empty predicate would otherwise slip
    # through every other rule (pred == <const> filters and the isin()
    # closed-vocab check all evaluate to NULL → row silently dropped)
    null_or_empty = (F.col("subj").isNull() | F.col("obj").isNull()
                     | F.col("pred").isNull()
                     | (F.trim("subj") == "") | (F.trim("obj") == "")
                     | (F.trim("pred") == ""))
    reports.append(_report(base.filter(null_or_empty), "empty_term"))

    if closed:
        reports.append(_report(
            base.filter(~F.col("pred").isin(list(shapes))), "closed_vocab"))

    for pred, shape in shapes.items():
        unknown = set(shape) - {"subject_prefix", "object_prefix",
                                "irreflexive", "subject_in",
                                "max_distinct_objects"}
        if unknown:
            raise ValueError(f"unknown constraint(s) {sorted(unknown)} "
                             f"for predicate {pred!r}")
        p = base.filter(F.col("pred") == pred)
        if "subject_prefix" in shape:
            reports.append(_report(
                p.filter(~F.col("subj").startswith(shape["subject_prefix"])),
                "subject_prefix"))
        if "object_prefix" in shape:
            reports.append(_report(
                p.filter(~F.col("obj").startswith(shape["object_prefix"])),
                "object_prefix"))
        if shape.get("irreflexive"):
            reports.append(_report(
                p.filter(F.col("subj") == F.col("obj")), "irreflexive"))
        if "subject_in" in shape:
            ref_pred, ref_pos = shape["subject_in"]
            if ref_pos not in ("subj", "obj"):
                raise ValueError(f"subject_in position must be subj|obj, "
                                 f"got {ref_pos!r}")
            members = (base.filter(F.col("pred") == ref_pred)
                       .select(F.col(ref_pos).alias("subj")).distinct())
            reports.append(_report(
                p.join(members, "subj", "left_anti"), "subject_domain"))
        if "max_distinct_objects" in shape:
            k = int(shape["max_distinct_objects"])
            if k < 1:
                raise ValueError("max_distinct_objects must be >= 1")
            over = (p.groupBy("subj")
                    .agg(F.count_distinct("obj").alias("_n"))
                    .filter(F.col("_n") > k).select("subj"))
            reports.append(_report(
                p.join(over, "subj"), "max_cardinality"))

    return reduce(DataFrame.unionByName,
                  (r.select(*_OUT) for r in reports))
