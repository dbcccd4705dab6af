"""Extended language-pack golden vectors ported from the reference
tests (/root/reference/analysis/lang/{ar,fa,hi,ckb,en,ca,ga,in}/
*_test.go). Terms compared; byte offsets are the documented char-offset
divergence."""

import pytest

from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.lang_extra import (
    arabic_normalize,
    arabic_stem,
    elision_ca_filter,
    elision_ga_filter,
    hindi_normalize,
    hindi_stem,
    indic_normalize,
    persian_normalize,
    possessive_filter_en,
    sorani_normalize,
    sorani_stem,
    stop_filter,
)

AR_ANALYZER = [
    ('كبير', ['كبير']),
    ('كبيرة', ['كبير']),
    ('مشروب', ['مشروب']),
    ('مشروبات', ['مشروب']),
    ('أمريكيين', ['امريك']),
    ('امريكي', ['امريك']),
    ('كتاب', ['كتاب']),
    ('الكتاب', ['كتاب']),
    ('ما ملكت أيمانكم', ['ملكت', 'ايمانكم']),
    ('الذين ملكت أيمانكم', ['ملكت', 'ايمانكم']),
    ('ﺍﻟﺴﻼﻢ', ['سلام']),
]

FA_ANALYZER = [
    ('می\u200cخورد', ['خورد']),
    ('خورد', ['خورد']),
    ('می\u200cخورد', ['خورد']),
    ('خواهد خورد', ['خورد']),
    ('دارد می\u200cخورد', ['خورد']),
    ('داشت می\u200cخورد', ['خورد']),
    ('خورده\u200cاست', ['خورده']),
    ('می\u200cخورده\u200cاست', ['خورده']),
    ('خورده بود', ['خورده']),
    ('می\u200cخورده بود', ['خورده']),
    ('خورده باشد', ['خورده']),
    ('می\u200cخورده باشد', ['خورده']),
    ('خورده بوده باشد', ['خورده']),
    ('می\u200cخورده بوده باشد', ['خورده']),
    ('خورده می\u200cشود', ['خورده']),
    ('خورده شد', ['خورده']),
    ('خورده می\u200cشد', ['خورده']),
    ('خورده شده\u200cاست', ['خورده']),
    ('خورده می\u200cشده\u200cاست', ['خورده']),
    ('خورده شده بود', ['خورده']),
    ('خورده می\u200cشده بود', ['خورده']),
    ('خورده خواهد شد', ['خورده']),
    ('دارد خورده می\u200cشود', ['خورده']),
    ('داشت خورده می\u200cشد', ['خورده']),
    ('خورده شود', ['خورده']),
    ('خورده شده باشد', ['خورده']),
    ('خورده می\u200cشده باشد', ['خورده']),
    ('خورده شده بوده باشد', ['خورده']),
    ('خورده می\u200cشده بوده باشد', ['خورده']),
    ('بخورد', ['بخورد']),
    ('مي خورد', ['خورد']),
    ('خورد', ['خورد']),
    ('مي خورد', ['خورد']),
    ('خواهد خورد', ['خورد']),
    ('دارد مي خورد', ['خورد']),
    ('داشت مي خورد', ['خورد']),
    ('خورده است', ['خورده']),
    ('مي خورده است', ['خورده']),
    ('خورده بود', ['خورده']),
    ('مي خورده بود', ['خورده']),
    ('خورده باشد', ['خورده']),
    ('مي خورده باشد', ['خورده']),
    ('خورده بوده باشد', ['خورده']),
    ('مي خورده بوده باشد', ['خورده']),
    ('خورده مي شود', ['خورده']),
    ('خورده شد', ['خورده']),
    ('خورده مي شد', ['خورده']),
    ('خورده شده است', ['خورده']),
    ('خورده مي شده است', ['خورده']),
    ('خورده شده بود', ['خورده']),
    ('خورده مي شده بود', ['خورده']),
    ('خورده خواهد شد', ['خورده']),
    ('دارد خورده مي شود', ['خورده']),
    ('داشت خورده مي شد', ['خورده']),
    ('خورده شود', ['خورده']),
    ('خورده شده باشد', ['خورده']),
    ('خورده مي شده باشد', ['خورده']),
    ('خورده شده بوده باشد', ['خورده']),
    ('خورده مي شده بوده باشد', ['خورده']),
    ('بخورد', ['بخورد']),
    ('برگ ها', ['برگ']),
    ('برگ\u200cها', ['برگ']),
    ('English test.', ['english', 'test']),
    ('خورده مي شده بوده باشد', ['خورده']),
    ('برگ\u200cها', ['برگ']),
]

HI_ANALYZER = [
    ('हिन्दी', ['हिंद']),
    ('हिंदी', ['हिंद']),
]

CKB_ANALYZER = [
    ('ئەم پیاوە', ['پیاو']),
    ('پیاوە', ['پیاو']),
    ('پیاو', ['پیاو']),
]

AR_NORMALIZE = [
    ('آجن', 'اجن'),
    ('أحمد', 'احمد'),
    ('إعاذ', 'اعاذ'),
    ('بنى', 'بني'),
    ('فاطمة', 'فاطمه'),
    ('روبرـــــت', 'روبرت'),
    ('مَبنا', 'مبنا'),
    ('علِي', 'علي'),
    ('بُوات', 'بوات'),
    ('ولداً', 'ولدا'),
    ('ولدٍ', 'ولد'),
    ('ولدٌ', 'ولد'),
    ('نلْسون', 'نلسون'),
    ('هتميّ', 'هتمي'),
    ('', ''),
]

AR_STEM = [
    ('الحسن', 'حسن'),
    ('والحسن', 'حسن'),
    ('بالحسن', 'حسن'),
    ('كالحسن', 'حسن'),
    ('فالحسن', 'حسن'),
    ('للاخر', 'اخر'),
    ('وحسن', 'حسن'),
    ('زوجها', 'زوج'),
    ('ساهدان', 'ساهد'),
    ('ساهدات', 'ساهد'),
    ('ساهدون', 'ساهد'),
    ('ساهدين', 'ساهد'),
    ('ساهديه', 'ساهد'),
    ('ساهدية', 'ساهد'),
    ('ساهده', 'ساهد'),
    ('ساهدة', 'ساهد'),
    ('ساهدي', 'ساهد'),
    ('وساهدون', 'ساهد'),
    ('ساهدهات', 'ساهد'),
    ('الو', 'الو'),
    ('English', 'English'),
    ('سلام', 'سلام'),
    ('السلام', 'سلام'),
    ('سلامة', 'سلام'),
    ('السلامة', 'سلام'),
    ('الوصل', 'وصل'),
    ('والصل', 'صل'),
    ('', ''),
]

FA_NORMALIZE = [
    ('های', 'هاي'),
    ('هاے', 'هاي'),
    ('کشاندن', 'كشاندن'),
    ('كتابۀ', 'كتابه'),
    ('كتابهٔ', 'كتابه'),
    ('زادہ', 'زاده'),
    ('', ''),
]

HI_NORMALIZE = [
    ('अँगरेज़ी', 'अंगरेजि'),
    ('अँगरेजी', 'अंगरेजि'),
    ('अँग्रेज़ी', 'अंगरेजि'),
    ('अँग्रेजी', 'अंगरेजि'),
    ('अंगरेज़ी', 'अंगरेजि'),
    ('अंगरेजी', 'अंगरेजि'),
    ('अंग्रेज़ी', 'अंगरेजि'),
    ('अंग्रेजी', 'अंगरेजि'),
    ('क़िताब', 'किताब'),
    ('फ़र्ज़', 'फरज'),
    ('क़र्ज़', 'करज'),
    ('ऱऴख़ग़ड़ढ़य़', 'रळखगडढय'),
    ('शार्\u200dमा', 'शारमा'),
    ('शार्\u200cमा', 'शारमा'),
    ('ॅॆॉॊऍऎऑऒॲ', 'ेेोोएएओओअ'),
    ('आईऊॠॡऐऔीूॄॣैौ', 'अइउऋऌएओिुृॢेो'),
    ('', ''),
]

HI_STEM = [
    ('लडका', 'लडक'),
    ('लडके', 'लडक'),
    ('लडकों', 'लडक'),
    ('गुरु', 'गुर'),
    ('गुरुओं', 'गुर'),
    ('दोस्त', 'दोस्त'),
    ('दोस्तों', 'दोस्त'),
    ('लडकी', 'लडक'),
    ('लडकियों', 'लडक'),
    ('किताब', 'किताब'),
    ('किताबें', 'किताब'),
    ('किताबों', 'किताब'),
    ('आध्यापीका', 'आध्यापीक'),
    ('आध्यापीकाएं', 'आध्यापीक'),
    ('आध्यापीकाओं', 'आध्यापीक'),
    ('खाना', 'खा'),
    ('खाता', 'खा'),
    ('खाती', 'खा'),
    ('खा', 'खा'),
    ('कठिनाइयां', 'कठिन'),
    ('कठिन', 'कठिन'),
    ('', ''),
]

CKB_NORMALIZE = [
    ('ي', 'ی'),
    ('ى', 'ی'),
    ('ی', 'ی'),
    ('ك', 'ک'),
    ('ک', 'ک'),
    ('ه\u200c', 'ە'),
    ('ه\u200cک', 'ەک'),
    ('ھ', 'ه'),
    ('ة', 'ە'),
    ('ههه', 'ههە'),
    ('ڒ', 'ڕ'),
    ('ررر', 'ڕرر'),
    ('ـ', ''),
    ('ً', ''),
    ('ٌ', ''),
    ('ٍ', ''),
    ('َ', ''),
    ('ُ', ''),
    ('ِ', ''),
    ('ّ', ''),
    ('ْ', ''),
    ('\u200c', ''),
    ('', ''),
]

CKB_STEM = [
    ('پیاوێک', 'پیاو'),
    ('دەرگایەک', 'دەرگا'),
    ('پیاوەكە', 'پیاو'),
    ('دەرگاكە', 'دەرگا'),
    ('کتاویە', 'کتاوی'),
    ('دەرگایە', 'دەرگا'),
    ('پیاوان', 'پیاو'),
    ('دەرگایان', 'دەرگا'),
    ('پیاوەکان', 'پیاو'),
    ('دەرگاکان', 'دەرگا'),
    ('پیاوانە', 'پیاو'),
    ('دەرگایانە', 'دەرگا'),
    ('هۆتیلی', 'هۆتیل'),
    ('هۆتیلێکی', 'هۆتیل'),
    ('هۆتیلانی', 'هۆتیل'),
    ('دوورەوە', 'دوور'),
    ('نیوەشەودا', 'نیوەشەو'),
    ('سۆرانا', 'سۆران'),
    ('پارەمان', 'پارە'),
    ('پارەتان', 'پارە'),
    ('پارەیان', 'پارە'),
    ('', ''),
]

IN_NORMALIZE = [
    ('अाॅअाॅ', 'ऑऑ'),
    ('अाॆअाॆ', 'ऒऒ'),
    ('अाेअाे', 'ओओ'),
    ('अाैअाै', 'औऔ'),
    ('अाअा', 'आआ'),
    ('अाैर', 'और'),
    ('ত্\u200d', 'ৎ'),
    ('', ''),
]


@pytest.mark.parametrize(
    "lang,cases",
    [
        ("ar", AR_ANALYZER),
        ("fa", FA_ANALYZER),
        ("hi", HI_ANALYZER),
        ("ckb", CKB_ANALYZER),
    ],
)
def test_extended_analyzer_golden(lang, cases):
    a = get_analyzer(lang)
    for text, expected in cases:
        assert a.terms(text) == expected, (lang, text)


@pytest.mark.parametrize("inp,out", AR_NORMALIZE)
def test_arabic_normalize(inp, out):
    assert arabic_normalize(inp) == out


@pytest.mark.parametrize("inp,out", AR_STEM)
def test_arabic_stem(inp, out):
    assert arabic_stem(inp) == out


@pytest.mark.parametrize("inp,out", FA_NORMALIZE)
def test_persian_normalize(inp, out):
    assert persian_normalize(inp) == out


@pytest.mark.parametrize("inp,out", HI_NORMALIZE)
def test_hindi_normalize(inp, out):
    assert hindi_normalize(inp) == out


@pytest.mark.parametrize("inp,out", HI_STEM)
def test_hindi_stem(inp, out):
    assert hindi_stem(inp) == out


@pytest.mark.parametrize("inp,out", CKB_NORMALIZE)
def test_sorani_normalize(inp, out):
    assert sorani_normalize(inp) == out


@pytest.mark.parametrize("inp,out", CKB_STEM)
def test_sorani_stem_pipeline(inp, out):
    # ref test runs single-token -> normalize -> stem
    assert sorani_stem(sorani_normalize(inp)) == out


@pytest.mark.parametrize("inp,out", IN_NORMALIZE)
def test_indic_normalize(inp, out):
    assert indic_normalize(inp) == out


def test_possessive_filter():
    # ref: lang/en/possessive_filter_en_test.go
    toks = [("marty's", 1, 0, 7), ("MARTY'S", 2, 8, 15), ("m\u2019s", 3, 16, 19)]
    got = [t[0] for t in possessive_filter_en(toks)]
    assert got[0] == "marty" and got[1] == "MARTY"


def test_ca_ga_elision():
    # ref: elision_ca_test.go ("l'Institut" -> "Institut"),
    #      elision_ga_test.go ("b'fhearr" -> "fhearr")
    assert [t[0] for t in elision_ca_filter([("l'Institut", 1, 0, 10)])] == [
        "Institut"
    ]
    assert [t[0] for t in elision_ga_filter([("b'fhearr", 1, 0, 8)])] == [
        "fhearr"
    ]


def test_stop_filters_all_langs():
    for lang in ("bg cs da el eu fi gl hr hu hy id nl no ro ru sv tr "
                 "ar fa hi ckb ca ga").split():
        f = stop_filter(lang)
        assert f([("zqzqzq", 1, 0, 6)]) == [("zqzqzq", 1, 0, 6)]


# -- Croatian (ref: analysis/lang/hr/analyzer_hr_test.go) -------------------

HR_ANALYZER = [
    ('Hrvatska', ['hrvatsk']),
    ('Hrvatski', ['hrvatsk']),
    ('KOMARAC', ['komarc']),
    ('crvi', ['crv']),
    ('biti', []),
    ('zaključcima', ['zaključk']),
]


def test_hr_analyzer_golden():
    a = get_analyzer("hr")
    for text, expected in HR_ANALYZER:
        assert a.terms(text) == expected, text


# -- EN plural stemmer vectors (ref: lang/en/plural_stemmer_test.go) --------

EN_PLURAL = [
    ('dresses', 'dress'),
    ('dress', 'dress'),
    ('axes', 'axe'),
    ('ad', 'ad'),
    ('ads', 'ad'),
    ('gas', 'ga'),
    ('sass', 'sass'),
    ('berries', 'berry'),
    ('dresses', 'dress'),
    ('spies', 'spy'),
    ('shoes', 'shoe'),
    ('headaches', 'headache'),
    ('computer', 'computer'),
    ('dressing', 'dressing'),
    ('clothes', 'clothe'),
    ('DRESSES', 'dress'),
    ('frog', 'frog'),
    ('dress', 'dress'),
    ('runs', 'run'),
    ('pies', 'pie'),
    ('foxes', 'fox'),
    ('axes', 'axe'),
    ('foes', 'fo'),
    ('dishes', 'dish'),
    ('snitches', 'snitch'),
    ('cliches', 'cliche'),
    ('forests', 'forest'),
    ('yes', 'ye'),
]


@pytest.mark.parametrize("inp,out", EN_PLURAL)
def test_english_plural_stem(inp, out):
    from bleve_spark.analysis.lang_extra import english_plural_stem

    assert english_plural_stem(inp) == out
