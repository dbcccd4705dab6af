"""Snowball-stemmer language packs (da/no/sv/ru): reference analyzer
golden vectors + spot morphology checks for the hand-implemented
Snowball algorithms (analysis/snowball.py)."""

import pytest

from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.snowball import (
    stem_da,
    stem_nl,
    stem_no,
    stem_ru,
    stem_sv,
)

DA_ANALYZER = [
    ('undersøg', ['undersøg']),
    ('undersøgelse', ['undersøg']),
    ('på', []),
]

NO_ANALYZER = [
    ('havnedistriktene', ['havnedistrikt']),
    ('havnedistrikter', ['havnedistrikt']),
    ('det', []),
]

SV_ANALYZER = [
    ('jaktkarlarne', ['jaktkarl']),
    ('jaktkarlens', ['jaktkarl']),
    ('och', []),
]

RU_ANALYZER = [
    ('километрах', ['километр']),
    ('актеров', ['актер']),
    ('как', []),
    ('text 1000', ['text', '1000']),
    ('Вместе с тем о силе электромагнитной энергии имели представление еще', ['вмест', 'сил', 'электромагнитн', 'энерг', 'имел', 'представлен']),
    ('Но знание это хранилось в тайне', ['знан', 'эт', 'хран', 'тайн']),
]


NL_ANALYZER = [
    ('lichamelijk', ['licham']),
    ('lichamelijke', ['licham']),
    ('van', []),
]

@pytest.mark.parametrize(
    "lang,cases",
    [
        ("da", DA_ANALYZER),
        ("no", NO_ANALYZER),
        ("sv", SV_ANALYZER),
        ("ru", RU_ANALYZER),
        ("nl", NL_ANALYZER),
    ],
)
def test_snowball_analyzer_golden(lang, cases):
    a = get_analyzer(lang)
    for text, expected in cases:
        assert a.terms(text) == expected, (lang, text)


def test_snowball_spot_checks():
    # canonical pairs from the published snowball sample vocabularies
    assert stem_da("indtagelse") == "indtag"
    assert stem_da("kystbyerne") == "kystby"
    assert stem_no("huset") == "hus"
    assert stem_no("dagene") == "dag"
    assert stem_sv("flickorna") == "flick"
    assert stem_sv("bokens") == "bok"
    assert stem_ru("книгами") == "книг"
    assert stem_ru("красивые") == "красив"
    assert stem_ru("бегавшая") == "бега"
    assert stem_nl("lichamen") == "licham"
    assert stem_nl("huizen") == "huiz"
    assert stem_nl("opheffing") == "opheff"
