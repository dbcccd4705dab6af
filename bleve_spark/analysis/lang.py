"""Top-tier language packs: de / fr / es / it / pt.

Each analyzer mirrors its reference chain (all unicode tokenizer +
lowercase first):

  de: stop_de -> normalize_de -> light_stemmer_de
      (ref: analysis/lang/de/analyzer_de.go, german_normalize.go,
       light_stemmer_de.go)
  fr: elision_fr -> stop_fr -> light_stemmer_fr
      (ref: analysis/lang/fr/analyzer_fr.go, light_stemmer_fr.go)
  es: stop_es -> light_stemmer_es
      (ref: analysis/lang/es/analyzer_es.go, light_stemmer_es.go)
  it: elision_it -> stop_it -> light_stemmer_it
      (ref: analysis/lang/it/analyzer_it.go, light_stemmer_it.go)
  pt: stop_pt -> light_stemmer_pt
      (ref: analysis/lang/pt/analyzer_pt.go, light_stemmer_pt.go)

The light stemmers are the Lucene *LightStemmer algorithms the
reference implements natively; they are re-expressed here in Python and
verified against token vectors ported from the reference's *_test.go.
"""

from __future__ import annotations

from typing import List

from .filters import make_elision_filter, make_stop_filter
from .stopwords_lang import (
    DE_STOP_WORDS,
    ES_STOP_WORDS,
    FR_ARTICLES,
    FR_STOP_WORDS,
    IT_ARTICLES,
    IT_STOP_WORDS,
    PT_STOP_WORDS,
)
from .tokenizers import Token

# -- German ----------------------------------------------------------------

_DE_FOLD = {
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
}

_ST_ENDING = frozenset("bdfghklmnt")


def german_normalize(term: str) -> str:
    """GermanNormalizationFilter: fold umlauts, ß->ss, and delete 'e'
    after a [aou]-started umlaut-state vowel run (the N/V/U state
    machine of ref german_normalize.go:normalize)."""
    N, V, U = 0, 1, 2
    state = N
    out: List[str] = []
    for ch in term:
        if ch in ("a", "o"):
            out.append(ch)
            state = U
        elif ch == "u":
            out.append(ch)
            state = U if state == N else V
        elif ch == "e":
            if state != U:
                out.append(ch)
            state = V
        elif ch in ("i", "q", "y"):
            out.append(ch)
            state = V
        elif ch == "ä":
            out.append("a")
            state = V
        elif ch == "ö":
            out.append("o")
            state = V
        elif ch == "ü":
            out.append("u")
            state = V
        elif ch == "ß":
            out.append("ss")
            state = N
        else:
            out.append(ch)
            state = N
    return "".join(out)


def german_light_stem(term: str) -> str:
    """ref: light_stemmer_de.go (Lucene GermanLightStemmer)."""
    s = "".join(_DE_FOLD.get(c, c) for c in term)
    # step 1
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and s[-1] in "mnrs" and s[-2] == "e":
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _ST_ENDING:
        s = s[:-1]
    # step 2
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and (s.endswith("er") or s.endswith("en")):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _ST_ENDING:
        s = s[:-2]
    return s


# -- French ----------------------------------------------------------------

_FR_FOLD = {
    "à": "a", "á": "a", "â": "a",
    "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u",
    "î": "i",
    "ç": "c",
}


def _fr_norm(s: str) -> str:
    """ref: light_stemmer_fr.go norm()."""
    if len(s) > 4:
        chars = [_FR_FOLD.get(c, c) for c in s]
        # squeeze runs of identical letters (the reference applies the
        # dedup pass inside the fold loop; net effect on the final
        # string is a single adjacent-duplicate squeeze)
        out = [chars[0]]
        for c in chars[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(term: str) -> str:
    """ref: light_stemmer_fr.go (Lucene FrenchLightStemmer)."""
    s = term
    if len(s) > 5 and s[-1] == "x":
        if s[-3:-1] == "au" and s[-4] != "e":
            s = s[:-2] + "l"
        else:
            s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 9 and s.endswith("issement"):
        return _fr_norm(s[: n - 6][:-1] + "r")
    if n > 8 and s.endswith("issant"):
        return _fr_norm(s[: n - 4][:-1] + "r")
    if n > 6 and s.endswith("ement"):
        s = s[: n - 4]
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-1]
            s = s[:-1] + "f"
        return _fr_norm(s)
    if n > 11 and s.endswith("ficatrice"):
        s = s[: n - 5]
        return _fr_norm(s[:-2] + "er")
    if n > 10 and s.endswith("ficateur"):
        s = s[: n - 4]
        return _fr_norm(s[:-2] + "er")
    if n > 9 and s.endswith("catrice"):
        s = s[: n - 3]
        return _fr_norm(s[:-4] + "que" + s[-1])
    if n > 8 and s.endswith("cateur"):
        s = s[: n - 2]
        return _fr_norm(s[:-4] + "quer")
    if n > 8 and s.endswith("atrice"):
        s = s[: n - 4]
        return _fr_norm(s[:-2] + "er")
    if n > 7 and s.endswith("ateur"):
        s = s[: n - 3]
        return _fr_norm(s[:-2] + "er")
    if n > 6 and s.endswith("trice"):
        s = s[:-1]
        s = s[:-3] + "eur"
        n = len(s)
    if n > 5 and s.endswith("ième"):
        return _fr_norm(s[: n - 4])
    if n > 7 and s.endswith("teuse"):
        s = s[: n - 2]
        return _fr_norm(s[:-1] + "r")
    if n > 6 and s.endswith("teur"):
        s = s[:-1]
        return _fr_norm(s[:-1] + "r")
    if n > 5 and s.endswith("euse"):
        return _fr_norm(s[: n - 2])
    if n > 8 and s.endswith("ère"):
        s = s[:-1]
        return _fr_norm(s[:-2] + "e" + s[-1])
    if n > 7 and s.endswith("ive"):
        s = s[:-1]
        return _fr_norm(s[:-1] + "f")
    if n > 4 and (s.endswith("folle") or s.endswith("molle")):
        s = s[: n - 2]
        return _fr_norm(s[:-1] + "u")
    if n > 9 and s.endswith("nnelle"):
        return _fr_norm(s[: n - 5])
    if n > 9 and s.endswith("nnel"):
        return _fr_norm(s[: n - 3])
    if n > 4 and s.endswith("ète"):
        s = s[:-1]
        s = s[:-2] + "e" + s[-1]
        n = len(s)
    if n > 8 and s.endswith("ique"):
        s = s[: n - 4]
        n = len(s)
    if n > 8 and s.endswith("esse"):
        return _fr_norm(s[: n - 3])
    if n > 7 and s.endswith("inage"):
        return _fr_norm(s[: n - 3])
    if n > 9 and s.endswith("isation"):
        s = s[: n - 7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "e" + s[-1]
        return _fr_norm(s)
    if n > 9 and s.endswith("isateur"):
        return _fr_norm(s[: n - 7])
    if n > 8 and s.endswith("ation"):
        return _fr_norm(s[: n - 5])
    if n > 8 and s.endswith("ition"):
        return _fr_norm(s[: n - 5])
    return _fr_norm(s)


# -- Spanish ---------------------------------------------------------------

_ES_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
}


def spanish_light_stem(term: str) -> str:
    """ref: light_stemmer_es.go (Lucene SpanishLightStemmer)."""
    if len(term) < 5:
        return term
    s = "".join(_ES_FOLD.get(c, c) for c in term)
    if s[-1] in "oae":
        return s[:-1]
    if s[-1] == "s":
        if s[-4:-1] == "ese":
            return s[:-2]
        if s[-3:-1] == "ce":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


# -- Italian ---------------------------------------------------------------

_IT_FOLD = _ES_FOLD  # same accent fold table (ref light_stemmer_it.go)


def italian_light_stem(term: str) -> str:
    """ref: light_stemmer_it.go (Lucene ItalianLightStemmer)."""
    if len(term) < 6:
        return term
    s = "".join(_IT_FOLD.get(c, c) for c in term)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last in "ao":
        return s[:-2] if prev == "i" else s[:-1]
    return s


# -- Portuguese ------------------------------------------------------------

_PT_FOLD = {
    "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ç": "c",
}


def _pt_remove_suffix(s: str) -> str:
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-2] + "l"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    n = len(s)
    if n > 7 and (
        s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")
    ):
        return s[:-1] + "o"
    if n > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(term: str) -> str:
    """ref: light_stemmer_pt.go (Lucene PortugueseLightStemmer)."""
    if len(term) < 4:
        return term
    s = _pt_remove_suffix(term)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return "".join(_PT_FOLD.get(c, c) for c in s)


# -- token-filter wrappers + registration ----------------------------------


def _term_filter(fn):
    def filt(tokens: List[Token]) -> List[Token]:
        return [(fn(t), p, s, e) for t, p, s, e in tokens]

    return filt


german_normalize_filter = _term_filter(german_normalize)
german_light_stem_filter = _term_filter(german_light_stem)
french_light_stem_filter = _term_filter(french_light_stem)
spanish_light_stem_filter = _term_filter(spanish_light_stem)
italian_light_stem_filter = _term_filter(italian_light_stem)
portuguese_light_stem_filter = _term_filter(portuguese_light_stem)

stop_de_filter = make_stop_filter(DE_STOP_WORDS)
stop_fr_filter = make_stop_filter(FR_STOP_WORDS)
stop_es_filter = make_stop_filter(ES_STOP_WORDS)
stop_it_filter = make_stop_filter(IT_STOP_WORDS)
stop_pt_filter = make_stop_filter(PT_STOP_WORDS)

elision_fr_filter = make_elision_filter(FR_ARTICLES)
elision_it_filter = make_elision_filter(IT_ARTICLES)


def register_language_analyzers():
    from . import Analyzer, register_analyzer
    from .filters import lowercase_filter
    from .tokenizers import unicode_tokenize

    chains = {
        "de": [
            lowercase_filter,
            stop_de_filter,
            german_normalize_filter,
            german_light_stem_filter,
        ],
        "fr": [
            lowercase_filter,
            elision_fr_filter,
            stop_fr_filter,
            french_light_stem_filter,
        ],
        "es": [lowercase_filter, stop_es_filter, spanish_light_stem_filter],
        "it": [
            lowercase_filter,
            elision_it_filter,
            stop_it_filter,
            italian_light_stem_filter,
        ],
        "pt": [lowercase_filter, stop_pt_filter, portuguese_light_stem_filter],
    }
    for name, filters in chains.items():
        register_analyzer(
            Analyzer(name, unicode_tokenize, token_filters=filters)
        )
