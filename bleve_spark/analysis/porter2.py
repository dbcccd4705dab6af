"""Porter2 — the Snowball English stemmer (the reference's
stemmer_en_snowball, ref: analysis/lang/en/stemmer_en_snowball.go via
github.com/blevesearch/snowballstem/english). Distinct from the classic
Porter stemmer (analysis/porter.py, the reference's stemmer_porter).

Implemented from the published algorithm definition
(snowballstem.org/algorithms/english/stemmer.html); verified
differentially against PostgreSQL's english_stem Snowball dictionary
(tools/snowball_difftest.py en)."""

from __future__ import annotations

from typing import List, Optional

from .tokenizers import Token

_V = "aeiouy"
_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_END = "cdeghkmnrt"

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTION2 = {
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed",
}


def _longest(word: str, suffixes) -> Optional[str]:
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _r1_en(word: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            return len(pre)
    for i in range(1, len(word)):
        if word[i] not in _V and word[i - 1] in _V:
            return i + 1
    return len(word)


def _r2_from(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if word[i] not in _V and word[i - 1] in _V:
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """A short syllable at the END of the word: vowel + non-vowel other
    than w/x/Y preceded by a non-vowel, or a vowel at the beginning
    followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in _V and word[1] not in _V
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            a not in _V
            and b in _V
            and b != "Y"
            and c not in _V
            and c not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


_STEP2 = (
    "tional", "enci", "anci", "abli", "entli", "izer", "ization",
    "ational", "ation", "ator", "alism", "aliti", "alli", "fulness",
    "ousli", "ousness", "iveness", "iviti", "biliti", "bli", "ogi",
    "fulli", "lessli", "li",
)
_STEP2_MAP = {
    "tional": "tion", "enci": "ence", "anci": "ance", "abli": "able",
    "entli": "ent", "izer": "ize", "ization": "ize", "ational": "ate",
    "ation": "ate", "ator": "ate", "alism": "al", "aliti": "al",
    "alli": "al", "fulness": "ful", "ousli": "ous", "ousness": "ous",
    "iveness": "ive", "iviti": "ive", "biliti": "ble", "bli": "ble",
    "fulli": "ful", "lessli": "less",
}
_STEP3 = ("tional", "ational", "alize", "icate", "iciti", "ical",
          "ful", "ness", "ative")
_STEP3_MAP = {
    "tional": "tion", "ational": "ate", "alize": "al", "icate": "ic",
    "iciti": "ic", "ical": "ic", "ful": "", "ness": "",
}
_STEP4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ism", "ate", "iti", "ous", "ive",
          "ize", "ion")


def porter2_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    # mark consonant y
    w = list(word)
    if w and w[0] == "y":
        w[0] = "Y"
    for i in range(1, len(w)):
        if w[i] == "y" and w[i - 1] in _V:
            w[i] = "Y"
    word = "".join(w)
    r1 = _r1_en(word)
    r2 = _r2_from(word, r1)

    # step 0: apostrophe suffixes
    suf = _longest(word, ("'s'", "'s", "'"))
    if suf:
        word = word[: len(word) - len(suf)]

    # step 1a
    suf = _longest(word, ("sses", "ied", "ies", "us", "ss", "s"))
    if suf == "sses":
        word = word[:-2]
    elif suf in ("ied", "ies"):
        base = word[: len(word) - len(suf)]
        word = base + ("i" if len(base) > 1 else "ie")
    elif suf == "s":
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if any(c in _V for c in word[:-2]):
            word = word[:-1]
    # 'us'/'ss': no action

    if word in _EXCEPTION2:
        return word

    # step 1b
    suf = _longest(word, ("eed", "eedly", "ed", "edly", "ing", "ingly"))
    if suf in ("eed", "eedly"):
        if len(word) - len(suf) >= r1:
            word = word[: len(word) - len(suf)] + "ee"
    elif suf in ("ed", "edly", "ing", "ingly"):
        base = word[: len(word) - len(suf)]
        if any(c in _V for c in base):
            word = base
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLE):
                word = word[:-1]
            elif _is_short(word, r1):
                word += "e"

    # step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _V
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must be in R1)
    suf = _longest(word, _STEP2)
    if suf and len(word) - len(suf) >= r1:
        base = word[: len(word) - len(suf)]
        if suf == "ogi":
            if base.endswith("l"):
                word = base + "og"
        elif suf == "li":
            if base and base[-1] in _LI_END:
                word = base
        else:
            word = base + _STEP2_MAP[suf]

    # step 3 (suffix in R1; 'ative' needs R2)
    suf = _longest(word, _STEP3)
    if suf and len(word) - len(suf) >= r1:
        base = word[: len(word) - len(suf)]
        if suf == "ative":
            if len(word) - len(suf) >= r2:
                word = base
        else:
            word = base + _STEP3_MAP[suf]

    # step 4 (suffix in R2)
    suf = _longest(word, _STEP4)
    if suf and len(word) - len(suf) >= r2:
        base = word[: len(word) - len(suf)]
        if suf == "ion":
            if base and base[-1] in "st":
                word = base
        else:
            word = base

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1
            and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def porter2_filter(tokens: List[Token]) -> List[Token]:
    return [(porter2_stem(t), p, s, e) for t, p, s, e in tokens]
