"""Snowball stemmers: Danish, Norwegian, Swedish, Russian.

The reference consumes these from the external snowballstem Go module
(ref: analysis/lang/{da,no,sv,ru}/stemmer_*.go importing
github.com/blevesearch/snowballstem). Re-implemented here from the
published Snowball algorithm definitions (snowballstem.org); verified
against the reference's analyzer golden vectors.

All stemmers expect lowercased input (the analyzer chains lowercase
first, matching the reference chain order).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from .tokenizers import Token

# ---------------------------------------------------------------------------
# shared helpers


def _r1_min3(word: str, vowels: str) -> int:
    """R1 start = after the first non-vowel following a vowel, but at
    least 3 (the Scandinavian-languages adjustment)."""
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, 3)


def _longest_suffix(
    word: str, region_start: int, suffixes: Sequence[str]
) -> Optional[str]:
    """Longest suffix of `word` (from the list) that lies wholly inside
    word[region_start:]."""
    best = None
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= region_start:
            if best is None or len(s) > len(best):
                best = s
    return best


# ---------------------------------------------------------------------------
# Danish


_DA_VOWELS = "aeiouyæåø"
_DA_STEP1 = (
    "hed ethed ered e erede ende erende ene erne ere en heden eren er "
    "heder erer heds es endes erendes enes ernes eres ens hedens erens "
    "ers ets erets et eret"
).split()
_DA_S_ENDING = "abcdfghjklmnoprtvyzå"


def stem_da(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _r1_min3(word, _DA_VOWELS)
    # step 1
    suf = _longest_suffix(word, r1, _DA_STEP1)
    if suf is not None:
        word = word[: -len(suf)]
    elif (
        len(word) > r1
        and word.endswith("s")
        and len(word) >= 2
        and word[-2] in _DA_S_ENDING
    ):
        word = word[:-1]
    # step 2: consonant-pair endings undouble to one letter
    if _longest_suffix(word, r1, ("gd", "dt", "gt", "kt")):
        word = word[:-1]
    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    suf = _longest_suffix(word, r1, ("elig", "lig", "els", "ig"))
    if suf is not None:
        word = word[: -len(suf)]
        if _longest_suffix(word, r1, ("gd", "dt", "gt", "kt")):
            word = word[:-1]
    elif _longest_suffix(word, r1, ("løst",)):
        word = word[:-1]
    # step 4: undouble a final double consonant in R1
    if (
        len(word) >= 2
        and len(word) > r1
        and word[-1] == word[-2]
        and word[-1] not in _DA_VOWELS
    ):
        word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# Norwegian


_NO_VOWELS = "aeiouyæåø"
_NO_STEP1 = (
    "a e ede ande ende ane ene hetene en heten ar er heter as es edes "
    "endes enes hetenes ens hetens ers ets et het ast"
).split()
_NO_S_ENDING = "bcdfghjlmnoprtvyz"


def stem_no(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _r1_min3(word, _NO_VOWELS)
    # step 1 (longest among delete-list, s-rule, erte/ert)
    best = _longest_suffix(word, r1, _NO_STEP1)
    ert = _longest_suffix(word, r1, ("erte", "ert"))
    s_ok = (
        len(word) > r1
        and word.endswith("s")
        and len(word) >= 2
        and (
            word[-2] in _NO_S_ENDING
            or (
                word[-2] == "k"
                and (len(word) < 3 or word[-3] not in _NO_VOWELS)
            )
        )
    )
    cand = max(
        [c for c in (best, ert, "s" if s_ok else None) if c is not None],
        key=len,
        default=None,
    )
    if cand is not None:
        if cand in ("erte", "ert"):
            word = word[: -len(cand)] + "er"
        else:
            word = word[: -len(cand)]
    # step 2
    if _longest_suffix(word, r1, ("dt", "vt")):
        word = word[:-1]
    # step 3
    suf = _longest_suffix(
        word,
        r1,
        (
            "hetslov", "slov", "elov", "lov", "elig", "eig", "lig",
            "els", "leg", "eleg", "ig",
        ),
    )
    if suf is not None:
        word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------------------
# Swedish


_SV_VOWELS = "aeiouyäåö"
_SV_STEP1 = (
    "a arna erna heterna orna ad e ade ande arne are aste en anden aren "
    "heten ern ar er heter or as arnas ernas ornas es ades andes ens "
    "arens hetens erns at andet het ast"
).split()
_SV_S_ENDING = "bcdfghjklmnoprtvy"


def stem_sv(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _r1_min3(word, _SV_VOWELS)
    # step 1
    suf = _longest_suffix(word, r1, _SV_STEP1)
    if suf is not None:
        word = word[: -len(suf)]
    elif (
        len(word) > r1
        and word.endswith("s")
        and len(word) >= 2
        and word[-2] in _SV_S_ENDING
    ):
        word = word[:-1]
    # step 2
    if _longest_suffix(word, r1, ("dd", "gd", "nn", "dt", "gt", "kt", "tt")):
        word = word[:-1]
    # step 3
    suf = _longest_suffix(word, r1, ("lig", "ig", "els"))
    if suf is not None:
        word = word[: -len(suf)]
    elif _longest_suffix(word, r1, ("löst",)):
        word = word[:-1]
    elif _longest_suffix(word, r1, ("fullt",)):
        word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# Russian


_RU_VOWELS = "аеиоуыэюя"

_RU_PERF_GERUND_1 = ("в", "вши", "вшись")  # preceded by а/я
_RU_PERF_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = (
    "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их ых "
    "ую юю ая яя ою ею"
).split()
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")  # preceded by а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно"
).split()  # preceded by а/я
_RU_VERB_2 = (
    "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло ено "
    "ят ует уют ит ыт ены ить ыть ишь ую ю"
).split()
_RU_NOUN = (
    "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием ем "
    "ам ом о у ах иях ях ы ь ию ью ю ия ья я"
).split()


def _ru_regions(word: str):
    rv = len(word)
    for i, c in enumerate(word):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    # R1: after first non-vowel following a vowel
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    # R2: same rule applied within R1
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ru_longest_grouped(word, rv, group1, group2):
    """Longest among group2 suffixes and group1 suffixes whose
    preceding char is а/я (the precondition char is kept)."""
    best = None
    for s in group2:
        if word.endswith(s) and len(word) - len(s) >= rv:
            if best is None or len(s) > len(best[0]):
                best = (s, len(s))
    for s in group1:
        if (
            word.endswith(s)
            and len(word) - len(s) - 1 >= 0
            and word[len(word) - len(s) - 1] in "ая"
            and len(word) - len(s) >= rv
        ):
            if best is None or len(s) > len(best[0]):
                best = (s, len(s))
    return best[0] if best else None


def stem_ru(word: str) -> str:
    if not word:
        return word
    word = word.replace("ё", "е")
    rv, r2 = _ru_regions(word)
    if rv >= len(word):
        return word
    # step 1: perfective gerund, else (reflexive), adjectival/verb/noun
    suf = _ru_longest_grouped(word, rv, _RU_PERF_GERUND_1, _RU_PERF_GERUND_2)
    if suf is not None:
        word = word[: -len(suf)]
    else:
        refl = _longest_suffix(word, rv, ("ся", "сь"))
        if refl is not None:
            word = word[: -len(refl)]
        adj = _longest_suffix(word, rv, _RU_ADJECTIVE)
        if adj is not None:
            word = word[: -len(adj)]
            part = _ru_longest_grouped(
                word, rv, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2
            )
            if part is not None:
                word = word[: -len(part)]
        else:
            verb = _ru_longest_grouped(word, rv, _RU_VERB_1, _RU_VERB_2)
            if verb is not None:
                word = word[: -len(verb)]
            else:
                noun = _longest_suffix(word, rv, _RU_NOUN)
                if noun is not None:
                    word = word[: -len(noun)]
    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]
    # step 3: derivational (R2)
    der = _longest_suffix(word, r2, ("ость", "ост"))
    if der is not None:
        word = word[: -len(der)]
    # step 4
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        sup = _longest_suffix(word, rv, ("ейше", "ейш"))
        if sup is not None:
            word = word[: -len(sup)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        if word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# registration


def _term_filter(fn):
    def filt(tokens: List[Token]) -> List[Token]:
        return [(fn(t), p, s, e) for t, p, s, e in tokens]

    return filt


snowball_da_filter = _term_filter(stem_da)
snowball_no_filter = _term_filter(stem_no)
snowball_sv_filter = _term_filter(stem_sv)
snowball_ru_filter = _term_filter(stem_ru)


def register_snowball_analyzers():
    from . import Analyzer, register_analyzer
    from .filters import lowercase_filter
    from .lang_extra import stop_filter
    from .tokenizers import unicode_tokenize

    for name, stemmer in (
        ("da", snowball_da_filter),
        ("no", snowball_no_filter),
        ("sv", snowball_sv_filter),
        ("ru", snowball_ru_filter),
    ):
        register_analyzer(
            Analyzer(  # ref: lang/<name>/analyzer_<name>.go
                name,
                unicode_tokenize,
                token_filters=[lowercase_filter, stop_filter(name), stemmer],
            )
        )


# ---------------------------------------------------------------------------
# Dutch


_NL_VOWELS = "aeiouyè"


def _nl_undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def _nl_valid_en_ending(word: str, cut: int) -> bool:
    # non-vowel, and not the 'gem' exception
    if cut == 0 or word[cut - 1] in _NL_VOWELS:
        return False
    return not word[:cut].endswith("gem")


def stem_nl(word: str) -> str:
    """Snowball Dutch: accent removal, i/y capitalization markers,
    R1(min-3)/R2 suffix ladder, e-removal with undoubling, vowel
    undoubling."""
    # preprocess: strip umlauts/acutes
    trans = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    word = word.translate(trans)
    if not word:
        return word
    # mark consonantal i/y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and chars[i - 1] in _NL_VOWELS
            and i + 1 < len(chars)
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)

    r1 = _r1_min3(word, _NL_VOWELS)
    # R2
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _NL_VOWELS and word[i - 1] in _NL_VOWELS:
            r2 = i + 1
            break

    # step 1
    suf = _longest_suffix(word, r1, ("heden", "ene", "en", "se", "s"))
    if suf == "heden":
        word = word[: -len(suf)] + "heid"
    elif suf in ("ene", "en"):
        cut = len(word) - len(suf)
        if _nl_valid_en_ending(word, cut):
            word = _nl_undouble(word[:cut])
    elif suf in ("se", "s"):
        cut = len(word) - len(suf)
        if cut > 0 and word[cut - 1] not in _NL_VOWELS + "j":
            word = word[:cut]

    # step 2
    e_removed = False
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in _NL_VOWELS
    ):
        word = _nl_undouble(word[:-1])
        e_removed = True

    # step 3a: heid
    if (
        word.endswith("heid")
        and len(word) - 4 >= r2
        and (len(word) < 5 or word[-5] != "c")
    ):
        word = word[:-4]
        if word.endswith("en"):
            cut = len(word) - 2
            if cut >= r1 and _nl_valid_en_ending(word, cut):
                word = _nl_undouble(word[:cut])

    # step 3b: d-suffixes
    suf = _longest_suffix(word, r2, ("end", "ing"))
    if suf is not None:
        word = word[: -len(suf)]
        if (
            word.endswith("ig")
            and len(word) - 2 >= r2
            and (len(word) < 3 or word[-3] != "e")
        ):
            word = word[:-2]
        else:
            word = _nl_undouble(word)
    elif (
        word.endswith("ig")
        and len(word) - 2 >= r2
        and (len(word) < 3 or word[-3] != "e")
    ):
        word = word[:-2]
    elif word.endswith("lijk") and len(word) - 4 >= r2:
        word = word[:-4]
        # repeat step 2
        if (
            word.endswith("e")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] not in _NL_VOWELS
        ):
            word = _nl_undouble(word[:-1])
    elif word.endswith("baar") and len(word) - 4 >= r2:
        word = word[:-4]
    elif word.endswith("bar") and len(word) - 3 >= r2 and e_removed:
        word = word[:-3]

    # step 4: undouble vowel in C V V D
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c not in _NL_VOWELS
            and v1 == v2
            and v1 in "aeou"
            and d not in _NL_VOWELS
            and d != "I"
        ):
            word = word[:-2] + word[-1]

    return word.translate(str.maketrans("IY", "iy"))


snowball_nl_filter = _term_filter(stem_nl)


def register_nl_analyzer():
    from . import Analyzer, register_analyzer
    from .filters import lowercase_filter
    from .lang_extra import stop_filter
    from .tokenizers import unicode_tokenize

    register_analyzer(
        Analyzer(  # ref: lang/nl/analyzer_nl.go
            "nl",
            unicode_tokenize,
            token_filters=[
                lowercase_filter,
                stop_filter("nl"),
                snowball_nl_filter,
            ],
        )
    )
