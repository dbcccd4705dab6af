"""Language-pack golden vectors ported from the reference tests
(/root/reference/analysis/lang/{de,fr,es,it,pt}/*_test.go). Terms and
positions are compared; byte offsets are a documented divergence (our
tokenizer reports char offsets)."""

import pytest

from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.lang import (
    french_light_stem,
    german_light_stem,
    german_normalize,
    italian_light_stem,
    portuguese_light_stem,
    spanish_light_stem,
    elision_fr_filter,
    elision_it_filter,
)

# analyzer-level vectors: input text -> expected terms (full chain)
DE_ANALYZER = [
    ('Tisch', ['tisch']),
    ('Tische', ['tisch']),
    ('Tischen', ['tisch']),
    ('Schaltflächen', ['schaltflach']),
    ('Schaltflaechen', ['schaltflach']),
    ('Blechern', ['blech']),
    ('Klecks', ['kleck']),
    ('Mindestens', ['mindest']),
    ('Kugelfest', ['kugelf']),
    ('Baldigst', ['baldig']),
]

FR_ANALYZER = [
    ('', []),
    ('chien chat cheval', ['chien', 'chat', 'cheval']),
    ('chien CHAT CHEVAL', ['chien', 'chat', 'cheval']),
    ('  chien  ,? + = -  CHAT /: > CHEVAL', ['chien', 'chat', 'cheval']),
    ('chien++', ['chien']),
    ('mot \\"entreguillemet\\"', ['mot', 'entreguilemet']),
    ('Jean-François', ['jean', 'francoi']),
    ('le la chien les aux chat du des à cheval', ['chien', 'chat', 'cheval']),
    ('lances chismes habitable chiste éléments captifs', ['lanc', 'chism', 'habitabl', 'chist', 'element', 'captif']),
    ('finissions souffrirent rugissante', ['finision', 'soufrirent', 'rugisant']),
    ("C3PO aujourd'hui oeuf ïâöûàä anticonstitutionnellement Java++ ", ['c3po', "aujourd'hui", 'oeuf', 'ïaöuaä', 'anticonstitutionel', 'java']),
    ('propriétaire', ['proprietair']),
]

ES_ANALYZER = [
    ('chicana', ['chican']),
    ('chicano', ['chican']),
    ('yeses', ['yes']),
    ('jaeces', ['jaez']),
    ('arcos', ['arc']),
    ('caos', ['caos']),
    ('parecer', ['parecer']),
]

IT_ANALYZER = [
    ('abbandonata', ['abbandonat']),
    ('abbandonati', ['abbandonat']),
    ('dallo', []),
    ("dell'Italia", ['ital']),
    ("l'Italiano", ['italian']),
    ("Nell'anfora", ['anfor']),
]

PT_ANALYZER = [
    ('quilométricas', ['quilometric']),
    ('quilométricos', ['quilometric']),
    ('não', []),
]

# filter-level vectors: single term in -> term out
DE_NORMALIZE = [
    ('Schaltflächen', 'Schaltflachen'),
    ('Schaltflaechen', 'Schaltflachen'),
    ('dauer', 'dauer'),
    ('weißbier', 'weissbier'),
    ('', ''),
]

FR_LIGHT = [
    ('chevaux', 'cheval'),
    ('cheval', 'cheval'),
    ('hiboux', 'hibou'),
    ('hibou', 'hibou'),
    ('chantés', 'chant'),
    ('chanter', 'chant'),
    ('chante', 'chant'),
    ('chant', 'chant'),
    ('baronnes', 'baron'),
    ('barons', 'baron'),
    ('baron', 'baron'),
    ('peaux', 'peau'),
    ('peau', 'peau'),
    ('anneaux', 'aneau'),
    ('anneau', 'aneau'),
    ('neveux', 'neveu'),
    ('neveu', 'neveu'),
    ('affreux', 'afreu'),
    ('affreuse', 'afreu'),
    ('investissement', 'investi'),
    ('investir', 'investi'),
    ('assourdissant', 'asourdi'),
    ('assourdir', 'asourdi'),
    ('pratiquement', 'pratiqu'),
    ('pratique', 'pratiqu'),
    ('administrativement', 'administratif'),
    ('administratif', 'administratif'),
    ('justificatrice', 'justifi'),
    ('justificateur', 'justifi'),
    ('justifier', 'justifi'),
    ('educatrice', 'eduqu'),
    ('eduquer', 'eduqu'),
    ('communicateur', 'comuniqu'),
    ('communiquer', 'comuniqu'),
    ('accompagnatrice', 'acompagn'),
    ('accompagnateur', 'acompagn'),
    ('administrateur', 'administr'),
    ('administrer', 'administr'),
    ('productrice', 'product'),
    ('producteur', 'product'),
    ('acheteuse', 'achet'),
    ('acheteur', 'achet'),
    ('planteur', 'plant'),
    ('plante', 'plant'),
    ('poreuse', 'poreu'),
    ('poreux', 'poreu'),
    ('plieuse', 'plieu'),
    ('bijoutière', 'bijouti'),
    ('bijoutier', 'bijouti'),
    ('caissière', 'caisi'),
    ('caissier', 'caisi'),
    ('abrasive', 'abrasif'),
    ('abrasif', 'abrasif'),
    ('folle', 'fou'),
    ('fou', 'fou'),
    ('personnelle', 'person'),
    ('personne', 'person'),
    ('complète', 'complet'),
    ('complet', 'complet'),
    ('aromatique', 'aromat'),
    ('faiblesse', 'faibl'),
    ('faible', 'faibl'),
    ('patinage', 'patin'),
    ('patin', 'patin'),
    ('sonorisation', 'sono'),
    ('ritualisation', 'rituel'),
    ('rituel', 'rituel'),
    ('nomination', 'nomin'),
    ('disposition', 'dispos'),
    ('dispose', 'dispos'),
    ('1234555', '1234555'),
    ('12333345', '12333345'),
    ('1234', '1234'),
    ('abcdeff', 'abcdef'),
    ('abcccddeef', 'abcdef'),
    ('créées', 'cre'),
    ('22hh00', '22h00'),
    ('propriétaire', 'proprietair'),
]

IT_LIGHT = [
    ('ragazzo', 'ragazz'),
    ('ragazzi', 'ragazz'),
]

PT_LIGHT = [
    ('doutores', 'doutor'),
    ('doutor', 'doutor'),
    ('homens', 'homem'),
    ('homem', 'homem'),
    ('papéis', 'papel'),
    ('papel', 'papel'),
    ('normais', 'normal'),
    ('normal', 'normal'),
    ('lencóis', 'lencol'),
    ('lencol', 'lencol'),
    ('barris', 'barril'),
    ('barril', 'barril'),
    ('botões', 'bota'),
    ('botão', 'bota'),
    ('o', 'o'),
]


@pytest.mark.parametrize(
    "lang,cases",
    [
        ("de", DE_ANALYZER),
        ("fr", FR_ANALYZER),
        ("es", ES_ANALYZER),
        ("it", IT_ANALYZER),
        ("pt", PT_ANALYZER),
    ],
)
def test_analyzer_golden(lang, cases):
    a = get_analyzer(lang)
    for text, expected in cases:
        assert a.terms(text) == expected, (lang, text)


@pytest.mark.parametrize("inp,out", DE_NORMALIZE)
def test_german_normalize(inp, out):
    # the reference filter preserves case; vectors are cased
    assert german_normalize(inp) == out


@pytest.mark.parametrize("inp,out", FR_LIGHT)
def test_french_light_stem(inp, out):
    assert french_light_stem(inp) == out


@pytest.mark.parametrize("inp,out", IT_LIGHT)
def test_italian_light_stem(inp, out):
    assert italian_light_stem(inp) == out


@pytest.mark.parametrize("inp,out", PT_LIGHT)
def test_portuguese_light_stem(inp, out):
    assert portuguese_light_stem(inp) == out


def test_elision():
    # ref: elision_fr_test.go / elision_it_test.go
    assert [t[0] for t in elision_fr_filter([("l'avion", 1, 0, 7)])] == ["avion"]
    assert [t[0] for t in elision_it_filter([("dell'Italia", 1, 0, 11)])] == [
        "Italia"
    ]


def test_spot_stems():
    # extra spot checks over the algorithmic ports
    assert german_light_stem("aufeinander") == "aufeinand"
    assert spanish_light_stem("casas") == "cas"
    assert portuguese_light_stem("bobagens") == "bobagem"
