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

Beyond the required BGP, two SPARQL-core compositions compile to the
obvious Catalyst join types:

  * ``optional=[pattern, ...]`` — SPARQL OPTIONAL: each optional group
    is itself a BGP, compiled with the same machinery and LEFT OUTER
    joined on its shared variables; its new variables come back NULL
    where the group found no match (never eliminating required rows);
  * ``negate=[pattern, ...]`` — SPARQL FILTER NOT EXISTS / MINUS: each
    group is a BGP whose matches REMOVE bindings, i.e. a LEFT ANTI
    join on the shared variables — Catalyst's anti-join needs only the
    join keys from the subquery, so the negation never widens the row.

Evaluation order is required BGP → negations → optionals (all against
the required bindings), the common SPARQL shape ``{ BGP FILTER NOT
EXISTS {...} OPTIONAL {...} }``; an optional that should survive a
negation belongs in a second match_pattern call.

Property paths compose INTO patterns: an element predicate written
``pred{1,k}`` (e.g. ``("?a", "co_mentioned{1,3}", "?b")``) is expanded
to the bounded closure of that predicate via ``match_path`` and joined
like any other element — SPARQL's ``?a pred{1,3} ?b`` path expression.
The closure is computed once per path element (it is already distinct
at the pair level), constants on either end filter the closure pairs.

``match_path`` is the bounded property path (SPARQL ``pred{1,k}``):
BFS frontier expansion over the DISTINCT edge set of one predicate,
each hop one join + anti-join against the already-discovered pairs, so
a pair's ``hops`` is its SHORTEST path length. Bounded k is a feature,
not a shortcut: an unbounded transitive closure over a social-shaped
graph is O(V²) output and no engine should produce it implicitly.

Scale: k-element patterns are k-1 joins over the triples relation —
exactly what a dedicated RDF store does, minus its specialized
indexes; partition-pruned parquet (predicate-partitioned layouts) slots
in transparently because the constants reach the scan as filters.
"""

from __future__ import annotations

import re
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "pred", "obj")
# element predicate "name{1,k}" = bounded property path (SPARQL pred{1,k})
_PATH_RE = re.compile(r"^(.+)\{1,(\d+)\}$")
# any brace suffix at all — used to REJECT unsupported bound forms
# (pred{2,3}, pred{0,5}, pred{1, 3}) instead of silently treating them
# as a constant predicate that matches nothing
_BRACE_RE = re.compile(r"^.+\{.*\}$")

# closures persisted by path elements inside match_pattern; the query
# result is lazy, so they cannot be unpersisted inside the call. Scope
# them with ``path_cache_scope()`` (preferred — long-lived sessions leak
# executor storage otherwise) or drain the fallback global list between
# query bursts with release_path_caches(). The global list is
# lock-guarded; scopes are thread-local, so concurrent query threads
# never release each other's closures.
_path_caches: list = []
_path_lock = threading.Lock()
_scope_stack = threading.local()


def _register_path_cache(df: DataFrame) -> None:
    stack = getattr(_scope_stack, "stack", None)
    if stack:
        stack[-1].append(df)
    else:
        with _path_lock:
            _path_caches.append(df)


@contextmanager
def path_cache_scope():
    """Tie ``pred{1,k}`` closure caches to a block: every closure
    persisted by match_pattern/match_path calls in this thread inside
    the ``with`` body is unpersisted on exit. MATERIALIZE results
    (collect/write) before the block ends — afterwards the lazy plan
    recomputes the closure instead of reading cache. Nests; inner
    scopes release only their own closures."""
    stack = getattr(_scope_stack, "stack", None)
    if stack is None:
        stack = _scope_stack.stack = []
    mine: list = []
    stack.append(mine)
    try:
        yield mine
    finally:
        stack.pop()
        for df in mine:
            df.unpersist()


def release_path_caches() -> int:
    """Unpersist every closure cached by ``pred{1,k}`` pattern
    elements OUTSIDE any ``path_cache_scope``; returns how many were
    released. Safe any time the DataFrames returned by earlier
    match_pattern calls are no longer needed (results already
    collected/written)."""
    with _path_lock:
        drained, _path_caches[:] = list(_path_caches), []
    for df in drained:
        df.unpersist()
    return len(drained)


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _check_pattern(pattern):
    if not pattern:
        raise ValueError("empty pattern")
    for el in pattern:
        if len(el) != 3:
            raise ValueError(f"pattern element must be a 3-tuple: {el!r}")
        if not any(_is_var(t) for t in el):
            raise ValueError(f"element binds no variable: {el!r}")


def _compile_bgp(base: DataFrame, pattern) -> tuple[DataFrame, set]:
    """Compile one BGP to (DISTINCT-bindings DataFrame, variable set)."""

    def compile_element(el):
        subj_t, pred_t, obj_t = el
        path = (_PATH_RE.match(pred_t)
                if isinstance(pred_t, str) and not _is_var(pred_t)
                else None)
        if path is None and isinstance(pred_t, str) \
                and not _is_var(pred_t) and _BRACE_RE.match(pred_t):
            raise ValueError(
                f"unsupported path bound in {pred_t!r}: only the form "
                "pred{1,k} (k >= 1, no spaces) is supported — a lower "
                "bound other than 1 is not; rewrite pred{2,3} as a "
                "1-hop element joined to pred{1,2}")
        if path:
            # expand the bounded closure once; its (src, dst) pairs then
            # behave exactly like a 2-position element (the closure stays
            # persisted because the query result is lazy — scope with
            # path_cache_scope() or call release_path_caches() between
            # query bursts)
            closure = match_path(base, path.group(1), int(path.group(2)))
            _register_path_cache(closure)
            df = closure.select(F.col("src").alias("subj"),
                                F.col("dst").alias("obj"))
            slots = [("subj", subj_t), ("obj", obj_t)]
        else:
            df = base
            slots = list(zip(_POS, el))
        names = {}
        for pos, term in slots:
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
    return out, bound


def match_pattern(triples: DataFrame, pattern: list[tuple[str, str, str]],
                  optional: list[list[tuple[str, str, str]]] | None = None,
                  negate: list[list[tuple[str, str, str]]] | None = None,
                  ) -> DataFrame:
    """See module docstring. ``triples`` needs subj/pred/obj columns;
    extras are ignored. Returns DISTINCT variable bindings; variables
    introduced only by an ``optional`` group are nullable."""
    _check_pattern(pattern)
    base = triples.select(*_POS)
    out, bound = _compile_bgp(base, pattern)

    for neg in (negate or []):
        _check_pattern(neg)
        ndf, nvars = _compile_bgp(base, neg)
        shared = bound & nvars
        if not shared:
            raise ValueError(
                f"negation group shares no variable with {sorted(bound)}"
                " — it would remove all or no rows; bind a shared var")
        # anti-join needs only the join keys from the subquery side
        out = out.join(ndf.select(*sorted(shared)).distinct(),
                       list(shared), "left_anti")

    for opt in (optional or []):
        _check_pattern(opt)
        odf, ovars = _compile_bgp(base, opt)
        shared = bound & ovars
        if not shared:
            raise ValueError(
                f"optional group shares no variable with {sorted(bound)}"
                " — it would cross-join; bind a shared var")
        new = ovars - bound
        if not new:
            raise ValueError(
                "optional group binds no new variable — use the required"
                " pattern (or negate=) instead")
        out = out.join(odf, list(shared), "left_outer")
        bound |= new

    return out.select(*sorted(bound)).distinct()


def match_path(triples: DataFrame, pred: str, max_hops: int = 3
               ) -> DataFrame:
    """Bounded property path ``pred{1,max_hops}``: all (src, dst, hops)
    pairs connected by 1..max_hops edges of one predicate, ``hops`` the
    shortest such length. See module docstring for the scale rationale
    behind the mandatory bound.

    One Spark job per hop (a ``count`` action, which both detects an
    empty frontier for early stop AND fully materializes the frontier's
    cache — same one-action-per-iteration posture as pagerank/CC), plus
    one final job that materializes the RETURNED DataFrame's cache, so
    every intermediate (edges, per-hop frontiers) can be unpersisted
    before returning without forcing a recompute. The single persist
    that survives is the returned result; callers that loop over many
    paths should ``unpersist()`` it when done.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    edges = (triples.filter(F.col("pred") == F.lit(pred))
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
             .distinct().persist())
    known = edges.withColumn("hops", F.lit(1))
    frontier = known
    frontiers = []
    for h in range(2, max_hops + 1):
        nxt = (frontier.select("src", F.col("dst").alias("_mid"))
               .join(edges.select(F.col("src").alias("_mid"), "dst"),
                     "_mid")
               .select("src", "dst").distinct()
               # keep only newly-discovered pairs → hops is shortest
               .join(known.select("src", "dst"), ["src", "dst"],
                     "left_anti")
               .withColumn("hops", F.lit(h)).persist())
        if nxt.count() == 0:
            nxt.unpersist()
            break
        frontiers.append(nxt)
        known = known.unionByName(nxt)
        frontier = nxt
    out = known.persist()
    out.count()  # materialize from the still-cached constituents
    edges.unpersist()
    for df in frontiers:
        df.unpersist()
    return out
