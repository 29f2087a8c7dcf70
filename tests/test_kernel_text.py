"""Pin normalize_text/underscore parity (SURVEY §7 hard part #1).

Expected values hand-derived from the Rails/inflection `underscore` spec
(`Duke/utils.py:12-19` applies it then maps `_`/`-`→space, strips parens,
splits on single space).
"""

import pandas as pd
import pytest

from duke_spark.kernel.text import (normalize_text, normalize_text_series,
                                    pluralize, tokenize_series, underscore)

UNDERSCORE_CASES = [
    ("camelCase", "camel_case"),
    ("PascalCase", "pascal_case"),
    ("HTTPServer", "http_server"),
    ("getHTTPResponseCode", "get_http_response_code"),
    ("already_snake", "already_snake"),
    ("dash-joined", "dash_joined"),
    ("ABC", "abc"),
    ("a1B", "a1_b"),
    ("Foo2Bar", "foo2_bar"),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", UNDERSCORE_CASES)
def test_underscore(raw, expected):
    assert underscore(raw) == expected


NORMALIZE_CASES = [
    ("homeRun scores", ["home", "run", "scores"]),
    ("snake_case_words", ["snake", "case", "words"]),
    ("dash-joined-words", ["dash", "joined", "words"]),
    ("with (parens) kept", ["with", "parens", "kept"]),
    ("HTTPServer log", ["http", "server", "log"]),
    # double space → empty token, preserved like the reference's split(' ')
    ("two  spaces", ["two", "", "spaces"]),
    ("", [""]),
]


@pytest.mark.parametrize("raw,expected", NORMALIZE_CASES)
def test_normalize_text(raw, expected):
    assert normalize_text(raw) == expected


def test_normalize_to_string():
    assert normalize_text("homeRun-hit (fast)", to_list=False) == "home run hit fast"


def test_vectorized_parity():
    texts = [c for c, _ in NORMALIZE_CASES] + [c for c, _ in UNDERSCORE_CASES]
    s = pd.Series(texts)
    scalar = [normalize_text(t, to_list=False) for t in texts]
    assert normalize_text_series(s).tolist() == scalar
    assert tokenize_series(s).tolist() == [normalize_text(t) for t in texts]


def test_vectorized_handles_null():
    s = pd.Series(["ok", None])
    assert tokenize_series(s).tolist() == [["ok"], [""]]


@pytest.mark.parametrize("word,plural", [
    ("player", "players"),
    ("city", "cities"),
    ("person", "people"),
    ("match", "matches"),
    ("bus", "buses"),
    ("species", "species"),
    ("home run", "home runs"),
    ("company", "companies"),
])
def test_pluralize(word, plural):
    assert pluralize(word) == plural
