"""Triple-pattern (basic-graph-pattern) matching over the KG — the
SPARQL-core query primitive, compiled to Catalyst equi-joins.

A pattern is a list of (subj, pred, obj) terms; a term starting with
``?`` is a variable, anything else a constant. The result is one row
per distinct variable binding, columns named after the variables — e.g.

    match_pattern(triples, [("?conv", "mentions", "?e1"),
                            ("?e1", "co_mentioned", "?e2")])
    -> DataFrame(conv, e1, e2)

Compilation, in Spark terms:

  * each pattern element is a scan of the SAME triples relation with
    constants pushed down as filters (Catalyst merges them into the
    parquet scan: PushedFilters on subj/pred/obj) and variables
    projected to their names;
  * elements join on shared variables (plain equi-joins — shuffle or
    broadcast as AQE sees fit); an element sharing NO variable with
    what's been joined so far would be a cartesian product, which is
    REFUSED (raise) rather than detonated — disconnected patterns are
    almost always a query bug;
  * join ORDER is chosen by selectivity: most-constant elements first
    (2 constants < 1 < 0), so the running intermediate stays small —
    the classic BGP heuristic (cf. Neumann & Weikum, RDF-3X, VLDB'09)
    without needing cardinality stats;
  * a variable repeated WITHIN one element (e.g. (?x, likes, ?x))
    becomes a self-equality filter before any join.

The final projection is DISTINCT over the variable columns (set
semantics, like SPARQL SELECT DISTINCT) so duplicate triples never
multiply results.

Scale: k-element patterns are k-1 joins over the triples relation —
exactly what a dedicated RDF store does, minus its specialized
indexes; partition-pruned parquet (predicate-partitioned layouts) slots
in transparently because the constants reach the scan as filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_pattern(triples: DataFrame, pattern: list[tuple[str, str, str]]
                  ) -> DataFrame:
    """See module docstring. ``triples`` needs subj/pred/obj columns;
    extras are ignored. Returns DISTINCT variable bindings."""
    if not pattern:
        raise ValueError("empty pattern")
    for el in pattern:
        if len(el) != 3:
            raise ValueError(f"pattern element must be a 3-tuple: {el!r}")
        if not any(_is_var(t) for t in el):
            raise ValueError(f"element binds no variable: {el!r}")

    base = triples.select(*_POS)

    def compile_element(el):
        df = base
        names = {}
        for pos, term in zip(_POS, el):
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError(f"bare '?' in {el!r}")
                if name in names:  # repeated var within the element
                    df = df.filter(F.col(pos) == F.col(names[name]))
                else:
                    names[name] = pos
            else:
                df = df.filter(F.col(pos) == F.lit(term))
        # dedup BEFORE joining: bindings are set-semantic, and the KG's
        # triples repeat (one fact per turn it appears in) — joining
        # first would MULTIPLY duplicate counts (20×15×10 copies per
        # binding) that the final distinct then pays to collapse; the
        # per-element distinct is the smallest possible relation
        df = df.select(*(F.col(p).alias(v) for v, p in names.items()))
        return df.distinct(), set(names)

    # selectivity heuristic: most constants (fewest vars) first
    order = sorted(range(len(pattern)),
                   key=lambda i: (sum(_is_var(t) for t in pattern[i]), i))
    compiled = [compile_element(pattern[i]) for i in order]

    out, bound = compiled[0]
    pending = list(compiled[1:])
    while pending:
        for j, (df, vs) in enumerate(pending):
            shared = bound & vs
            if shared:
                out = out.join(df, list(shared))
                bound |= vs
                pending.pop(j)
                break
        else:
            raise ValueError(
                "disconnected pattern: remaining elements share no "
                f"variable with {sorted(bound)} — a cartesian product; "
                "split the query instead")
    return out.select(*sorted(bound)).distinct()
