"""Named-component registry + custom analyzers (ref: registry/*.go,
mapping/index.go AddCustom*, analyzer/custom/custom.go)."""

import pytest

from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.registry import (
    add_custom_analyzer,
    build_custom_analyzer,
)


def test_custom_equals_builtin_standard():
    a = build_custom_analyzer(
        "std2",
        {"tokenizer": "unicode", "token_filters": ["to_lower", "stop_en"]},
    )
    builtin = get_analyzer("standard")
    text = "The Quick BROWN fox and the dog"
    assert a.analyze(text) == builtin.analyze(text)


def test_custom_chain_with_factories():
    a = build_custom_analyzer(
        "code_shingles",
        {
            "char_filters": ["html"],
            "tokenizer": "unicode",
            "token_filters": [
                "camelCase",
                "to_lower",
                {"type": "shingle", "min": 2, "max": 2},
            ],
        },
    )
    terms = a.terms("<b>parseIndex fooBar</b>")
    assert "parse index" in terms and "index foo" in terms


def test_custom_regexp_components():
    a = build_custom_analyzer(
        "csv",
        {
            "char_filters": [{"type": "regexp", "regexp": ";", "replace": ","}],
            "tokenizer": {"type": "regexp", "regexp": "[^,]+"},
            "token_filters": ["to_lower"],
        },
    )
    assert a.terms("A;b,C") == ["a", "b", "c"]


def test_lang_stop_and_en_extras():
    a = build_custom_analyzer(
        "fr_min",
        {"tokenizer": "unicode", "token_filters": ["to_lower", "stop_fr"]},
    )
    assert a.terms("le chat") == ["chat"]
    b = build_custom_analyzer(
        "poss",
        {
            "tokenizer": "unicode",
            "token_filters": ["possessive_en", "stemmer_en_plural"],
        },
    )
    assert b.terms("Marty's dresses") == ["marty", "dress"]


def test_register_and_unknown_errors():
    add_custom_analyzer(
        "kw2", {"tokenizer": "single", "token_filters": ["to_lower"]}
    )
    assert get_analyzer("kw2").terms("One Two") == ["one two"]
    with pytest.raises(KeyError):
        build_custom_analyzer("x", {"tokenizer": "nope"})
    with pytest.raises(KeyError):
        build_custom_analyzer(
            "x", {"tokenizer": "unicode", "token_filters": ["nope"]}
        )
    with pytest.raises(ValueError):
        build_custom_analyzer("x", {})
