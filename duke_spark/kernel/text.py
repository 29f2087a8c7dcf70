"""Text normalization kernels with exact reference parity.

The reference normalizes every cell/header via ``normalize_text``
(``Duke/utils.py:12-19``): Rails-style ``underscore`` (camelCase →
snake_case), then ``_``/``-`` → space, strip parens, split on a single
space. ``underscore``/``pluralize`` come from the ``inflection`` package
(a public port of Rails ActiveSupport's inflector); we reimplement the
needed rules here rather than depend on it.

Two implementations are provided and unit-tested for parity:
  * scalar (``normalize_text``) — used by the NumPy oracle;
  * vectorized over ``pd.Series`` (``normalize_text_series``) — used
    inside the Arrow-batched Spark UDF stages (no per-row Python).
"""

from __future__ import annotations

import re

import pandas as pd

# Rails/inflection `underscore` regexes (public spec):
#   1. split ACRONYMWord boundaries: "HTTPServer" -> "HTTP_Server"
#   2. split lowerUpper boundaries:  "camelCase"  -> "camel_Case"
#   3. dashes -> underscores, then lowercase.
_RE_ACRONYM = re.compile(r"([A-Z]+)([A-Z][a-z])")
_RE_CAMEL = re.compile(r"([a-z\d])([A-Z])")


def underscore(word: str) -> str:
    """camelCase/PascalCase → snake_case (``Duke/utils.py:13`` semantics)."""
    word = _RE_ACRONYM.sub(r"\1_\2", word)
    word = _RE_CAMEL.sub(r"\1_\2", word)
    word = word.replace("-", "_")
    return word.lower()


# `Duke/utils.py:12` default replace_chars, applied in dict order.
_REPLACE_CHARS = {"_": " ", "-": " ", "(": "", ")": ""}


def normalize_text(text: str, to_list: bool = True):
    """Exact ``Duke/utils.py:12-19`` semantics.

    underscore → char replaces → split(' '). Note the reference splits on a
    single space, so runs of spaces yield empty-string tokens; we preserve
    that, and downstream OOV filtering removes them (empty string is never
    in vocab).
    """
    text = underscore(text)
    for old, new in _REPLACE_CHARS.items():
        text = text.replace(old, new)
    return text.split(" ") if to_list else text


def normalize_text_series(texts: pd.Series) -> pd.Series:
    """Vectorized ``normalize_text(to_list=False)`` over a string Series."""
    s = texts.fillna("")
    s = s.str.replace(_RE_ACRONYM, r"\1_\2", regex=True)
    s = s.str.replace(_RE_CAMEL, r"\1_\2", regex=True)
    s = s.str.replace("-", "_", regex=False)
    s = s.str.lower()
    s = s.str.replace("_", " ", regex=False)
    s = s.str.replace("(", "", regex=False)
    s = s.str.replace(")", "", regex=False)
    return s


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized ``normalize_text(to_list=True)``: Series of token lists."""
    return normalize_text_series(texts).str.split(" ")


# --- pluralize (only used for the one-sentence summary,
#     `Duke/dataset_descriptor.py:85`) ---------------------------------------

_PLURAL_RULES = [
    (re.compile(r"(quiz)$", re.I), r"\1zes"),
    (re.compile(r"^(oxen)$", re.I), r"\1"),
    (re.compile(r"^(ox)$", re.I), r"\1en"),
    (re.compile(r"(m|l)ice$", re.I), r"\1ice"),
    (re.compile(r"(m|l)ouse$", re.I), r"\1ice"),
    (re.compile(r"(matr|vert|ind)(?:ix|ex)$", re.I), r"\1ices"),
    (re.compile(r"(x|ch|ss|sh)$", re.I), r"\1es"),
    (re.compile(r"([^aeiouy]|qu)y$", re.I), r"\1ies"),
    (re.compile(r"(hive)$", re.I), r"\1s"),
    (re.compile(r"([^f])fe$", re.I), r"\1ves"),
    (re.compile(r"([lr])f$", re.I), r"\1ves"),
    (re.compile(r"sis$", re.I), "ses"),
    (re.compile(r"([ti])um$", re.I), r"\1a"),
    (re.compile(r"(buffal|tomat)o$", re.I), r"\1oes"),
    (re.compile(r"(bu)s$", re.I), r"\1ses"),
    (re.compile(r"(alias|status)$", re.I), r"\1es"),
    (re.compile(r"(octop|vir)us$", re.I), r"\1i"),
    (re.compile(r"^(ax|test)is$", re.I), r"\1es"),
    (re.compile(r"s$", re.I), "s"),
    (re.compile(r"$"), "s"),
]

_IRREGULAR = {
    "person": "people",
    "man": "men",
    "woman": "women",
    "child": "children",
    "sex": "sexes",
    "move": "moves",
}

_UNCOUNTABLE = frozenset(
    {"equipment", "fish", "information", "jeans", "money", "rice", "series",
     "sheep", "species", "data"}
)


def pluralize(word: str) -> str:
    """Rails-style pluralize for the summary sentence (subset of rules)."""
    if not word or word.lower() in _UNCOUNTABLE:
        return word
    # pluralize the last space-separated word (multi-word class names)
    head, _, last = word.rpartition(" ")
    if last.lower() in _IRREGULAR:
        out = _IRREGULAR[last.lower()]
    else:
        out = last
        for rule, repl in _PLURAL_RULES:
            if rule.search(last):
                out = rule.sub(repl, last)
                break
    return f"{head} {out}" if head else out
