"""Token-level golden tests, mirroring the reference's analysis tests
(/root/reference/analysis/**/*_test.go)."""

from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.filters import (
    camelcase_filter,
    lowercase_filter,
    make_edge_ngram_filter,
    make_hierarchy_filter,
    make_ngram_filter,
    make_shingle_filter,
    stop_en_filter,
    unique_filter,
)
from bleve_spark.analysis.porter import porter_stem
from bleve_spark.analysis.stopwords_en import ENGLISH_STOP_WORDS
from bleve_spark.analysis.tokenizers import (
    letter_tokenize,
    single_tokenize,
    unicode_tokenize,
    whitespace_tokenize,
)


def toks(term_list):
    """Build a reference-style token stream: back-to-back offsets,
    sequential positions (ref: camelcase_test.go tokenStream helper)."""
    out = []
    idx = 0
    for i, t in enumerate(term_list):
        out.append((t, i + 1, idx, idx + len(t)))
        idx += len(t)
    return out


def terms(tokens):
    return [t[0] for t in tokens]


# -- camelCase golden cases (ref: analysis/token/camelcase/camelcase_test.go:25-72)
def test_camelcase_golden():
    cases = [
        ([""], [""]),
        (["a"], ["a"]),
        (
            ["...aMACMac123macILoveGolang"],
            ["...", "a", "MAC", "Mac", "123", "mac", "I", "Love", "Golang"],
        ),
        (["Lang"], ["Lang"]),
        (["GLang"], ["G", "Lang"]),
        (["GOLang"], ["GO", "Lang"]),
        (["GOOLang"], ["GOO", "Lang"]),
        (["1234"], ["1234"]),
        (["starbucks"], ["starbucks"]),
        (
            ["Starbucks", " ", "TVSamsungIsGREAT000"],
            ["Starbucks", " ", "TV", "Samsung", "Is", "GREAT", "000"],
        ),
    ]
    for inp, expected in cases:
        got = camelcase_filter(toks(inp))
        assert terms(got) == expected, (inp, terms(got))
        # positions sequential, offsets contiguous (parser.go:21-32)
        assert [t[1] for t in got] == list(range(1, len(expected) + 1))


def test_unicode_tokenizer():
    assert terms(unicode_tokenize("Hello World.")) == ["Hello", "World"]
    # underscore is ExtendNumLet: snake_case is one token (UAX#29)
    assert terms(unicode_tokenize("snake_case foo2bar")) == [
        "snake_case",
        "foo2bar",
    ]
    # mid-word apostrophe kept
    assert terms(unicode_tokenize("can't stop")) == ["can't", "stop"]
    t = unicode_tokenize("ab cd")
    assert t[0] == ("ab", 1, 0, 2)
    assert t[1] == ("cd", 2, 3, 5)


def test_letter_whitespace_single():
    assert terms(letter_tokenize("abc123def _x")) == ["abc", "def", "x"]
    assert terms(whitespace_tokenize(" a  b\tc\n")) == ["a", "b", "c"]
    assert single_tokenize("hello world") == [("hello world", 1, 0, 11)]
    assert single_tokenize("") == []


def test_stop_filter_position_gaps():
    # survivors keep original positions (ref: token/stop/stop.go:40-52)
    stream = unicode_tokenize("the quick brown fox and the dog")
    got = stop_en_filter(lowercase_filter(stream))
    assert [(t[0], t[1]) for t in got] == [
        ("quick", 2),
        ("brown", 3),
        ("fox", 4),
        ("dog", 7),
    ]


def test_stopword_set_size():
    # the snowball list the reference embeds has 174 entries
    assert len(ENGLISH_STOP_WORDS) == 174
    assert "the" in ENGLISH_STOP_WORDS and "very" in ENGLISH_STOP_WORDS


def test_standard_analyzer():
    a = get_analyzer("standard")
    assert a.terms("The Quick brown FOX!") == ["quick", "brown", "fox"]


def test_code_analyzer():
    a = get_analyzer("code")
    assert a.terms("func getHTTPServer(fooBar)") == [
        "func",
        "get",
        "http",
        "server",
        "foo",
        "bar",
    ]


def test_en_analyzer_stemming():
    a = get_analyzer("en")
    assert a.terms("running quickly through libraries") == [
        "run",
        "quickli",
        "librari",
    ]


def test_porter_canonical_samples():
    # canonical pairs from Porter's public voc.txt/output.txt
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "hopping": "hop",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "controlling": "control", "generalization": "gener",
        "oscillators": "oscil", "university": "univers",
    }
    for w, e in cases.items():
        assert porter_stem(w) == e, (w, porter_stem(w), e)


def test_ngram_filters():
    assert terms(make_edge_ngram_filter(1, 3)(toks(["fund"]))) == [
        "f",
        "fu",
        "fun",
    ]
    assert terms(make_ngram_filter(2, 2)(toks(["abc"]))) == ["ab", "bc"]
    assert terms(make_shingle_filter(2, 2)(toks(["a", "b", "c"]))) == [
        "a b",
        "b c",
    ]
    assert terms(make_hierarchy_filter("/")(toks(["a/b/c"]))) == [
        "a",
        "a/b",
        "a/b/c",
    ]
    assert terms(unique_filter(toks(["a", "b", "a", "c", "b"]))) == [
        "a",
        "b",
        "c",
    ]


def test_fast_termfreq_matches_generic():
    """Fused fast paths must be behavior-identical to the generic chain."""
    import random

    from bleve_spark.analysis import _FAST_TERMFREQ, get_analyzer
    from bleve_spark.corpus import generate_corpus

    texts = list(generate_corpus(60)["content"]) + [
        "", "The quick brown fox AND the dog", "snake_case getHTTPServer",
        "a  b\t c\nd", "can't won't o'clock", "...aMACMac123mac",
    ]
    for name in _FAST_TERMFREQ:
        a = get_analyzer(name)
        fast = a.fast_termfreq
        for text in texts:
            tokens = a.analyze(text)
            freqs = {}
            for t in tokens:
                freqs.setdefault(t[0], []).append(t[1])
            generic = (len(tokens), freqs)
            assert fast(text) == generic, (name, text[:60])


def test_asciifolding_char_filter():
    from bleve_spark.analysis import asciifolding_char_filter as fold

    assert fold("café Ærø straße") == "cafe AEro strasse"
    assert fold("Łódź") == "Lodz"
    assert fold("“smart” – ‘quotes’…") == '"smart" - \'quotes\'...'
    assert fold("plain ascii 123") == "plain ascii 123"


def test_cjk_width_filter():
    from bleve_spark.analysis.filters import cjk_width_filter

    toks = [("ＡＢＣ", 1, 0, 3), ("ｶﾀｶﾅ", 2, 4, 8)]
    out = cjk_width_filter(toks)
    assert out[0][0] == "ABC"
    assert out[1][0] == "カタカナ"


def test_cjk_bigram_filter():
    from bleve_spark.analysis.filters import make_cjk_bigram_filter

    f = make_cjk_bigram_filter()
    out = f([("日本語", 1, 0, 3)])
    assert [t[0] for t in out] == ["日本", "本語"]
    assert [t[1] for t in out] == [1, 2]
    # isolated single ideograph passes as unigram
    assert [t[0] for t in f([("日", 1, 0, 1)])] == ["日"]
    # latin tokens untouched
    assert [t[0] for t in f([("hello", 1, 0, 5)])] == ["hello"]
    # mixed stream keeps positions dense
    out2 = f([("hello", 1, 0, 5), ("日本語", 2, 6, 9)])
    assert [(t[0], t[1]) for t in out2] == [
        ("hello", 1), ("日本", 2), ("本語", 3)
    ]


def test_dict_compound_filter():
    from bleve_spark.analysis.filters import make_dict_compound_filter

    f = make_dict_compound_filter(["soft", "ball", "team"])
    out = f([("softballteam", 1, 0, 12)])
    terms = [t[0] for t in out]
    assert terms[0] == "softballteam"
    assert set(terms[1:]) == {"soft", "ball", "team"}
    # offsets point at the substring
    by_term = {t[0]: (t[2], t[3]) for t in out}
    assert by_term["ball"] == (4, 8)
