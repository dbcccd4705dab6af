"""Snowball stemmer variants fr/de/es/it + Porter2 English + French
minimal stemmer — reference test vectors and registry resolution.

Vectors from /root/reference/analysis/lang/fr/stemmer_fr_snowball_test.go,
minimal_stemmer_fr_test.go, es/stemmer_es_snowball_test.go,
it/stemmer_it_snowball_test.go, de/stemmer_de_test.go; the broader
differential verification against PostgreSQL's Snowball dictionaries
lives in tools/snowball_difftest.py (75k+ comparisons, 0 mismatches —
recorded in BASELINE.md)."""

import pytest

from bleve_spark.analysis.porter2 import porter2_stem
from bleve_spark.analysis.snowball_variants import (
    stem_de,
    stem_es,
    stem_fr,
    stem_fr_min,
    stem_it,
)

# ref: stemmer_fr_snowball_test.go
FR_VECTORS = [
    ("antagoniste", "antagon"),
    ("barbouillait", "barbouill"),
    ("calculateur", "calcul"),
    # snowball-site sample pairs
    ("continuation", "continu"),
    ("contradictoirement", "contradictoir"),
    ("conférence", "conférent"),
    ("payaient", "pai"),
    ("majestueux", "majestu"),
]

# ref: minimal_stemmer_fr_test.go
FR_MIN_VECTORS = [
    ("chevaux", "cheval"),
    ("hiboux", "hibou"),
    ("chantés", "chant"),
    ("chanter", "chant"),
    ("chante", "chant"),
    ("baronnes", "baron"),
    ("barons", "baron"),
    ("baron", "baron"),
]

# ref: stemmer_es_snowball_test.go
ES_VECTORS = [
    ("agresivos", "agres"),
    ("agresivamente", "agres"),
    ("agresividad", "agres"),
    ("comunicación", "comun"),
    ("guerrero", "guerrer"),
    ("torturadores", "tortur"),
]

# ref: stemmer_it_snowball_test.go
IT_VECTORS = [
    ("aizzata", "aizz"),
    ("aizzargli", "aizz"),
    ("aizzasse", "aizz"),
    ("abbandonerebbero", "abbandon"),
    ("pronto", "pront"),
]

# ref: stemmer_de_test.go (snowball cases)
DE_VECTORS = [
    ("abzuschrecken", "abzuschreck"),
    ("abzuwarten", "abzuwart"),
    ("zwirnfabrik", "zwirnfabr"),
    ("zyniker", "zynik"),
    ("aufeinanderfolgende", "aufeinanderfolg"),
    ("kategorie", "kategori"),
]

EN_VECTORS = [
    ("consign", "consign"),
    ("consigned", "consign"),
    ("consigning", "consign"),
    ("consolidate", "consolid"),
    ("generically", "generic"),
    ("communities", "communiti"),
    ("skies", "sky"),
    ("dying", "die"),
    ("news", "news"),
    ("proceed", "proceed"),
    ("crying", "cri"),
    ("controlled", "control"),
    ("hopping", "hop"),
    ("hoping", "hope"),
]


@pytest.mark.parametrize("word,want", FR_VECTORS)
def test_stem_fr(word, want):
    assert stem_fr(word) == want


@pytest.mark.parametrize("word,want", FR_MIN_VECTORS)
def test_stem_fr_min(word, want):
    assert stem_fr_min(word) == want


@pytest.mark.parametrize("word,want", ES_VECTORS)
def test_stem_es(word, want):
    assert stem_es(word) == want


@pytest.mark.parametrize("word,want", IT_VECTORS)
def test_stem_it(word, want):
    assert stem_it(word) == want


@pytest.mark.parametrize("word,want", DE_VECTORS)
def test_stem_de(word, want):
    assert stem_de(word) == want


@pytest.mark.parametrize("word,want", EN_VECTORS)
def test_porter2(word, want):
    assert porter2_stem(word) == want


def test_reference_token_filter_names_resolve():
    """Every stemmer/normalizer/elision name the reference registers
    must resolve in a custom-analyzer config (VERDICT round-3 item 5:
    configs written against the reference resolve verbatim)."""
    from bleve_spark.analysis.registry import build_custom_analyzer

    names = [
        "stemmer_fr_snowball", "stemmer_de_snowball",
        "stemmer_es_snowball", "stemmer_it_snowball",
        "stemmer_en_snowball", "stemmer_fr_min",
        "stemmer_da_snowball", "stemmer_no_snowball",
        "stemmer_sv_snowball", "stemmer_ru_snowball",
        "stemmer_nl_snowball", "stemmer_fi_snowball",
        "stemmer_hu_snowball", "stemmer_ro_snowball",
        "stemmer_tr_snowball", "stemmer_de_light",
        "stemmer_fr_light", "stemmer_es_light", "stemmer_it_light",
        "stemmer_pt_light", "stemmer_porter", "stemmer_en_plural",
        "possessive_en", "stemmer_ar", "stemmer_ckb", "stemmer_hi",
        "stemmer_hr", "hr_suffix_transformation_filter",
        "normalize_ar", "normalize_ckb", "normalize_fa",
        "normalize_hi", "normalize_in", "normalize_de",
        "elision_fr", "elision_it", "elision_ca", "elision_ga",
        "stop_fr", "stop_de", "stop_es", "stop_it",
    ]
    for name in names:
        a = build_custom_analyzer(
            f"custom_{name}",
            {"tokenizer": "unicode", "token_filters": ["to_lower", name]},
        )
        assert a is not None, name


def test_custom_chain_with_snowball_variant():
    from bleve_spark.analysis.registry import build_custom_analyzer

    a = build_custom_analyzer(
        "fr_snowball_chain",
        {
            "tokenizer": "unicode",
            "token_filters": [
                "to_lower", "elision_fr", "stop_fr", "stemmer_fr_snowball",
            ],
        },
    )
    toks = [t[0] for t in a.analyze("les calculateurs continuaient")]
    assert toks == ["calcul", "continu"]


def test_generic_snowball_factory():
    from bleve_spark.analysis.registry import build_custom_analyzer

    a = build_custom_analyzer(
        "generic_snowball",
        {
            "tokenizer": "unicode",
            "token_filters": [
                "to_lower",
                {"type": "stemmer_snowball", "language": "spanish"},
            ],
        },
    )
    assert [t[0] for t in a.analyze("Torturadores")] == ["tortur"]
    with pytest.raises(ValueError, match="language"):
        build_custom_analyzer(
            "bad",
            {
                "tokenizer": "unicode",
                "token_filters": [{"type": "stemmer_snowball"}],
            },
        )
