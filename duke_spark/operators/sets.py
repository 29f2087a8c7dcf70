"""Set operators (SURVEY A34/A35).

The reference uses these as tiny driver-side helpers: ``get_dropped``
(``Duke/utils.py:40-41``) reports which values a filter removed, and the
ontology prep unions class-name sets (``Duke/class_tree.py:139-141``).
Both get a plain-Python form (for driver-resident sets, exactly like the
reference) and a DataFrame form (distributed EXCEPT / UNION DISTINCT —
one shuffle each, AQE-coalesced) for when the operands are columns of a
table instead of in-memory lists.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Set

from pyspark.sql import DataFrame


def dropped(old: Iterable, new: Iterable) -> Set:
    """Values present in ``old`` but not ``new`` (``Duke/utils.py:40-41``)."""
    return set(old).difference(new)


def union_distinct(*iterables: Iterable) -> Set:
    """Distinct union of value collections (``Duke/class_tree.py:139-141``
    builds ``all_classes`` this way)."""
    out: Set = set()
    for it in iterables:
        out.update(it)
    return out


def df_dropped(old: DataFrame, new: DataFrame) -> DataFrame:
    """Distributed A34: rows of ``old`` absent from ``new`` (set
    semantics — SQL EXCEPT, i.e. distinct)."""
    return old.subtract(new)


def df_union_distinct(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """Distributed A35: UNION DISTINCT by column name."""
    return reduce(lambda a, b: a.unionByName(b), rest, first).distinct()
