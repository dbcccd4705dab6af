"""Snowball-stemmer language packs fi/hu/ro/tr: reference analyzer
golden vectors (analysis/lang/{fi,hu,ro,tr}/analyzer_*_test.go) + spot
morphology checks for the hand-implemented algorithms
(analysis/snowball_ext.py)."""

import pytest

from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.snowball_ext import (
    stem_fi,
    stem_hu,
    stem_ro,
    stem_tr,
)

FI_ANALYZER = [  # ref: analyzer_fi_test.go
    ("edeltäjiinsä", ["edeltäj"]),
    ("edeltäjistään", ["edeltäj"]),
    ("olla", []),
]

HU_ANALYZER = [  # ref: analyzer_hu_test.go
    ("babakocsi", ["babakocs"]),
    ("babakocsijáért", ["babakocs"]),
    ("által", []),
]

RO_ANALYZER = [  # ref: analyzer_ro_test.go
    ("absenţa", ["absenţ"]),
    ("absenţi", ["absenţ"]),
    ("îl", []),
]

TR_ANALYZER = [  # ref: analyzer_tr_test.go (incl. apostrophe cases)
    ("ağacı", ["ağaç"]),
    ("ağaç", ["ağaç"]),
    ("dolayı", []),
    ("Kıbrıs'ta", ["kıbrıs"]),
    ("Van Gölü'ne", ["van", "göl"]),
]


@pytest.mark.parametrize(
    "lang,cases",
    [
        ("fi", FI_ANALYZER),
        ("hu", HU_ANALYZER),
        ("ro", RO_ANALYZER),
        ("tr", TR_ANALYZER),
    ],
)
def test_snowball_ext_analyzer_golden(lang, cases):
    a = get_analyzer(lang)
    for text, expected in cases:
        assert a.terms(text) == expected, (lang, text)


def test_fi_morphology():
    # case endings + plural
    assert stem_fi("taloissa") == "talo"
    assert stem_fi("taloissansa") == "talo"
    # t-plural + tidy(b): inflected and base map to the same stem
    assert stem_fi("kirjat") == stem_fi("kirja") == "kirj"
    # particle chain joins the same class
    assert stem_fi("kirjako") == "kirj"
    # tidy consonant undouble
    assert stem_fi("pukki") == "puk"
    # stems stay stable
    assert stem_fi("talo") == "talo"


def test_hu_morphology():
    # frequent cases
    assert stem_hu("házban") == "ház"
    assert stem_hu("házakat") == "ház"  # plural + case
    # final á keeps its accent when outside R1 (v_ending is R1-gated)
    assert stem_hu("fát") == "fá"
    # stems stay stable
    assert stem_hu("ház") == "ház"


def test_ro_morphology():
    # step 0 plural article
    assert stem_ro("copilul") == "copil"
    # prelude marks i-between-vowels consonantal, so copiii only loses
    # its final vowel, while copii takes ii->i then the vowel strip
    assert stem_ro("copiii") == "copii"
    assert stem_ro("copii") == "cop"
    # combining suffix reduction
    assert stem_ro("contabilitate") == "contabil"
    # stems stay stable
    assert stem_ro("copil") == "copil"


def test_tr_morphology():
    # plural + devoicing
    assert stem_tr("kitaplar") == "kitap"
    assert stem_tr("kitabı") == "kitap"
    assert stem_tr("evlerinden") == "ev"
    # one-syllable words never stem
    assert stem_tr("ev") == "ev"
    assert stem_tr("at") == "at"
    # stems stay stable
    assert stem_tr("kitap") == "kitap"
