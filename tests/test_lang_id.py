"""Production language ID (operators/lang_id.py): accuracy on the
labeled multilingual fixture, script-language exactness, und fallback,
and the no-shuffle/no-UDF plan shape."""

import pandas as pd
import pytest

from duke_spark.fixtures.multilingual import SAMPLES, SCRIPT_ONLY
from duke_spark.operators.lang_id import (STOPWORD_PROFILES,
                                          TRIGRAM_PROFILES,
                                          detect_language,
                                          trigram_profile)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(lang, s) for lang, ss in SAMPLES.items() for s in ss]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["lang_true", "text"]))


def test_language_coverage_claim():
    langs = set(STOPWORD_PROFILES) | SCRIPT_ONLY
    assert len(langs) >= 40
    assert set(SAMPLES) == langs          # every claimed lang has samples


def test_accuracy_on_labeled_fixture(spark, labeled):
    got = detect_language(labeled).toPandas()
    got["hit"] = got["lang_true"] == got["lang_pred"]
    acc = got["hit"].mean()
    misses = got.loc[~got["hit"], ["lang_true", "lang_pred"]]
    assert acc >= 0.95, f"accuracy {acc:.3f}; misses:\n{misses}"
    # script-identified languages must be exact — the script share of a
    # native sentence is ~1.0 and nothing else can fire
    script = got[got["lang_true"].isin(SCRIPT_ONLY)]
    assert script["hit"].all(), script.loc[~script["hit"]]


def test_und_fallback(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "text": ["12345 67890", "!!! ??? ...", "", "   "]}))
    got = detect_language(df).toPandas()
    assert (got["lang_pred"] == "und").all()


def test_prefix_bound_caps_cost(spark):
    """Signals come from the first prefix_len chars only: a doc whose
    first 1200 chars are German stays German no matter how much English
    follows — and per-row cost is O(prefix), not O(doc)."""
    de = SAMPLES["de"][0] + ". "
    long_doc = (de * 30)[:1200] + "  " + SAMPLES["en"][2] * 200
    df = spark.createDataFrame(pd.DataFrame({"text": [long_doc]}))
    got = detect_language(df).toPandas()
    assert got.loc[0, "lang_pred"] == "de"


def test_plan_is_narrow_jvm_projection(spark, labeled):
    plan = detect_language(labeled)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan          # no shuffle
    assert "Python" not in plan            # no UDF / mapInPandas


def test_trigram_profile_derivation():
    assert trigram_profile(["the"]) == [" th", "he ", "the"]
    # profiles are deduped, sorted, and only contain length-3 grams
    for prof in TRIGRAM_PROFILES.values():
        assert prof == sorted(set(prof))
        assert all(len(g) == 3 for g in prof)


def test_mixed_script_quote_does_not_flip(spark):
    """A Latin document quoting a few foreign-script characters must stay
    in its language: script-language scores are count RATIOS (a stray
    Greek word is a tiny fraction of letters), not presence flags."""
    df = spark.createDataFrame(pd.DataFrame({"text": [
        "The philosopher wrote the word λόγος in the margin of the book "
        "and then continued the argument in plain English for the rest "
        "of the very long chapter about language and meaning",
        "Сегодня мы прочитали слово hello в английском тексте, но вся "
        "статья написана на русском языке и рассказывает о погоде",
    ]}))
    got = detect_language(df).toPandas()
    assert got.loc[0, "lang_pred"] == "en"
    assert got.loc[1, "lang_pred"] == "ru"
