"""Snowball stemmers: Finnish, Hungarian, Romanian, Turkish.

The reference consumes these from the external snowballstem Go module
(ref: analysis/lang/{fi,hu,ro,tr}/stemmer_*.go importing
github.com/blevesearch/snowballstem v0.9.0). Re-implemented here from
the published Snowball algorithm definitions (snowballstem.org:
finnish/hungarian/romanian/turkish stemmer descriptions); verified
against the reference's analyzer golden vectors
(analysis/lang/{fi,hu,ro,tr}/analyzer_*_test.go).

All stemmers expect lowercased input (the analyzer chains lowercase
first, matching the reference chain order). Romanian: the algorithm's
suffix alphabet uses the cedilla forms s-cedilla/t-cedilla (U+015F/
U+0163) as the reference-era Snowball sources do; comma-below forms
(U+0219/U+021B) are accepted on input and normalized to cedilla.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence

from .tokenizers import Token

# ---------------------------------------------------------------------------
# shared helpers


def _std_r1_r2(word: str, vowels: str) -> tuple:
    """Standard Snowball R1/R2: R1 = region after the first non-vowel
    following a vowel; R2 = the same, evaluated within R1."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _longest_in(word: str, region_start: int, suffixes) -> Optional[str]:
    """Longest suffix from the list lying wholly inside
    word[region_start:] (Snowball among + setlimit semantics: the
    match itself must fit in the region; conditions on preceding
    characters are checked by the caller, unrestricted)."""
    best = None
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= region_start:
            if best is None or len(s) > len(best):
                best = s
    return best


# ===========================================================================
# Finnish
# ===========================================================================

_FI_V1 = "aeiouyäö"
_FI_V2 = "aeiouäö"
_FI_C = "bcdfghjklmnpqrstvwxz"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_PARTICLE_END = _FI_V1 + "nt"

_FI_STEP1_PARTICLES = (
    "kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä",
)
_FI_POSS_PLAIN = ("nsa", "nsä", "mme", "nne")
_FI_AN_PREC = ("ta", "ssa", "sta", "lla", "lta", "na")
_FI_AEN_PREC = ("tä", "ssä", "stä", "llä", "ltä", "nä")
_FI_EN_PREC = ("lle", "ine")
_FI_CASE_PLAIN = (
    "ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
    "lle", "na", "nä", "ksi", "ine",
)
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "hän": "ä", "hön": "ö"}
_FI_OTHER_COND = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
_FI_OTHER_PLAIN = ("impi", "impa", "impä", "immi", "imma", "immä",
                   "eja", "ejä")


def _fi_ends_long(word: str) -> bool:
    return len(word) >= 2 and word[-2:] in _FI_LONG


def stem_fi(word: str) -> str:
    """Snowball Finnish (snowballstem.org/algorithms/finnish): steps
    particle_etc, possessive, case_ending, other_endings,
    i_plural/t_plural, tidy over standard R1/R2."""
    r1, r2 = _std_r1_r2(word, _FI_V1)

    # step 1: particles etc (longest suffix in R1; condition may fail
    # without backtracking to a shorter suffix — among semantics)
    cands = list(_FI_STEP1_PARTICLES) + ["sti"]
    suf = _longest_in(word, r1, cands)
    if suf == "sti":
        if len(word) - 3 >= r2:
            word = word[:-3]
    elif suf is not None:
        prev = word[-len(suf) - 1] if len(word) > len(suf) else ""
        if prev in _FI_PARTICLE_END:
            word = word[: -len(suf)]

    # step 2: possessives
    cands = ["si", "ni", "an", "än", "en"] + list(_FI_POSS_PLAIN)
    suf = _longest_in(word, r1, cands)
    if suf in _FI_POSS_PLAIN:
        word = word[: -len(suf)]
    elif suf == "si":
        if not (len(word) >= 3 and word[-3] == "k"):
            word = word[:-2]
    elif suf == "ni":
        word = word[:-2]
        if word.endswith("kse"):
            word = word[:-1] + "i"
    elif suf == "an":
        if any(word[: -2].endswith(p) for p in _FI_AN_PREC):
            word = word[:-2]
    elif suf == "än":
        if any(word[: -2].endswith(p) for p in _FI_AEN_PREC):
            word = word[:-2]
    elif suf == "en":
        if any(word[: -2].endswith(p) for p in _FI_EN_PREC):
            word = word[:-2]

    # step 3: cases
    ending_removed = False
    cands = (
        list(_FI_HXN) + ["siin", "den", "tten", "seen", "a", "ä",
                         "tta", "ttä", "n"] + list(_FI_CASE_PLAIN)
    )
    suf = _longest_in(word, r1, cands)
    if suf is not None:
        stem = word[: -len(suf)]
        ok = False
        if suf in _FI_HXN:
            ok = stem.endswith(_FI_HXN[suf])
        elif suf in ("siin", "den", "tten"):
            # preceded by V2 + i
            ok = (len(stem) >= 2 and stem[-1] == "i"
                  and stem[-2] in _FI_V2)
        elif suf == "seen":
            ok = _fi_ends_long(stem)
        elif suf in ("a", "ä"):
            # preceded by consonant + V1 vowel
            ok = (len(stem) >= 2 and stem[-1] in _FI_V1
                  and stem[-2] in _FI_C)
        elif suf in ("tta", "ttä"):
            ok = stem.endswith("e")
        elif suf in _FI_CASE_PLAIN:
            ok = True
        elif suf == "n":
            ok = True
            if _fi_ends_long(stem) or stem.endswith("ie"):
                stem = stem[:-1]
        if ok:
            word = stem
            ending_removed = True

    # step 4: other endings (R2)
    suf = _longest_in(word, r2, list(_FI_OTHER_COND) + list(_FI_OTHER_PLAIN))
    if suf in _FI_OTHER_PLAIN:
        word = word[: -len(suf)]
    elif suf in _FI_OTHER_COND:
        if not word[: -len(suf)].endswith("po"):
            word = word[: -len(suf)]

    # step 5: plurals
    if ending_removed:
        if word and word[-1] in "ij" and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if (
            word.endswith("t")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in _FI_V1
        ):
            word = word[:-1]
            suf = _longest_in(word, r2, ("imma", "mma"))
            if suf == "imma":
                word = word[:-4]
            elif suf == "mma" and not word[:-3].endswith("po"):
                word = word[:-3]

    # step 6: tidy (a-d within R1; e over the whole word)
    if len(word) - 1 >= r1 and _fi_ends_long(word) and len(word) - 2 >= r1:
        word = word[:-1]
    if (
        len(word) >= 2
        and word[-1] in "aäei"
        and word[-2] in _FI_C
        and len(word) - 2 >= r1
    ):
        word = word[:-1]
    if word.endswith(("oj", "uj")) and len(word) - 2 >= r1:
        word = word[:-1]
    if word.endswith("jo") and len(word) - 2 >= r1:
        word = word[:-1]
    # e) undouble a final consonant pair that is followed only by vowels
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_V1:
        i -= 1
    if i >= 1 and word[i] not in _FI_V1 and word[i - 1] == word[i]:
        word = word[:i] + word[i + 1:]
    return word


# ===========================================================================
# Hungarian
# ===========================================================================

_HU_V = "aeiouáéíóöőúüű"
_HU_DIGRAPHS = ("dzs", "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
                "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_MARK_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLE = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk",
              "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
              "tt", "tty", "vv", "zz", "zzs")


def _hu_r1(word: str) -> int:
    """Hungarian R1: if the word begins with a vowel, the region after
    the first consonant or digraph; if it begins with a consonant, the
    region after the first vowel."""
    n = len(word)
    if not word:
        return n
    if word[0] in _HU_V:
        for i in range(1, n):
            if word[i] not in _HU_V:
                for d in _HU_MARK_DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if word[i] in _HU_V:
            return i + 1
    return n


def _hu_ends_double(word: str) -> Optional[str]:
    best = None
    for d in _HU_DOUBLE:
        if word.endswith(d) and (best is None or len(d) > len(best)):
            best = d
    return best


def _hu_undouble(word: str) -> str:
    """bb -> b, ccs -> cs (drop the first letter of the double)."""
    d = _hu_ends_double(word)
    if d is None:
        return word
    return word[: len(word) - len(d)] + word[len(word) - len(d) + 1:]


def _hu_v_ending(word: str, r1: int) -> str:
    """Word-final á/é (in R1) normalize to a/e after a removal."""
    if word.endswith("á") and len(word) - 1 >= r1:
        return word[:-1] + "a"
    if word.endswith("é") and len(word) - 1 >= r1:
        return word[:-1] + "e"
    return word


_HU_CASE = (
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
    "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
    "anként", "ként", "en", "on", "an", "ön", "n", "t",
)
# (suffix, action): None = delete, else replacement string
_HU_CASE_SPECIAL = {"én": "e", "án": "a", "ánként": "a"}
_HU_CASE_OTHER = {"astul": None, "estül": None, "ástul": "a",
                  "éstül": "e"}
_HU_OWNED = {"oké": None, "öké": None, "aké": None, "eké": None,
             "áké": "a", "éké": "e", "ké": None, "éé": "e", "é": None}
_HU_SING_OWNER = {
    "ünk": None, "unk": None, "ánk": "a", "énk": "e", "nk": None,
    "ájuk": "a", "éjük": "e", "juk": None, "jük": None,
    "uk": None, "ük": None,
    "ám": "a", "ém": "e", "om": None, "am": None, "em": None, "m": None,
    "ád": "a", "éd": "e", "od": None, "ad": None, "ed": None,
    "öd": None, "d": None,
    "ja": None, "je": None, "a": None, "e": None, "o": None,
    "á": "a", "é": "e",
}
_HU_PLUR_OWNER = {
    "jaim": None, "jeim": None, "áim": "a", "éim": "e",
    "aim": None, "eim": None, "im": None,
    "jaid": None, "jeid": None, "áid": "a", "éid": "e",
    "aid": None, "eid": None, "id": None,
    "jai": None, "jei": None, "ái": "a", "éi": "e",
    "ai": None, "ei": None, "i": None,
    "jaink": None, "jeink": None, "áink": "a", "éink": "e",
    "aink": None, "eink": None, "ink": None,
    "jaitok": None, "jeitek": None, "áitok": "a", "éitek": "e",
    "aitok": None, "eitek": None, "itek": None,
    "jeik": None, "jaik": None, "áik": "a", "éik": "e",
    "aik": None, "eik": None, "ik": None,
}
_HU_PLURAL = {"ák": "a", "ék": "e", "ök": None, "ak": None, "ok": None,
              "ek": None, "k": None}


def _hu_map_step(word: str, r1: int, table: dict) -> str:
    suf = _longest_in(word, r1, table.keys())
    if suf is None:
        return word
    repl = table[suf]
    word = word[: -len(suf)]
    if repl is not None:
        word += repl
    return word


def stem_hu(word: str) -> str:
    """Snowball Hungarian (snowballstem.org/algorithms/hungarian):
    instrum, case, case_special, case_other, factive, owned,
    sing_owner, plur_owner, plural over the Hungarian R1."""
    r1 = _hu_r1(word)

    # instrumental case: al/el preceded by a double consonant
    suf = _longest_in(word, r1, ("al", "el"))
    if suf is not None and _hu_ends_double(word[:-2]):
        word = _hu_undouble(word[:-2])

    # frequent cases, then á/é normalization
    suf = _longest_in(word, r1, _HU_CASE)
    if suf is not None:
        word = word[: -len(suf)]
        word = _hu_v_ending(word, r1)

    word = _hu_map_step(word, r1, _HU_CASE_SPECIAL)
    word = _hu_map_step(word, r1, _HU_CASE_OTHER)

    # factive: á/é preceded by a double consonant
    suf = _longest_in(word, r1, ("á", "é"))
    if suf is not None and _hu_ends_double(word[:-1]):
        word = _hu_undouble(word[:-1])

    word = _hu_map_step(word, r1, _HU_OWNED)
    word = _hu_map_step(word, r1, _HU_SING_OWNER)
    word = _hu_map_step(word, r1, _HU_PLUR_OWNER)
    word = _hu_map_step(word, r1, _HU_PLURAL)
    return word


# ===========================================================================
# Romanian
# ===========================================================================

# cedilla forms (U+015F, U+0163) are the algorithm's alphabet, matching
# the reference vectors' encoding; comma forms normalize in.
_RO_SC = "ş"  # ş
_RO_TC = "ţ"  # ţ
_RO_V = "aeiouăâî"  # a e i o u ă â î

_RO_STEP0 = {
    "ul": None, "ului": None,
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",  # special: not preceded by 'ab'
    "atei": "at",
    "a" + _RO_TC + "ie": "a" + _RO_TC + "i",
    "a" + _RO_TC + "ia": "a" + _RO_TC + "i",
}

_AB = "ă"  # ă


def _ro_combo_table():
    t = {}
    for s in ("abilitate", "abilitati", "abilit" + _AB + "i",
              "abilit" + _AB + _RO_TC + "i"):
        t[s] = "abil"
    t["ibilitate"] = "ibil"
    for s in ("ivitate", "ivitati", "ivit" + _AB + "i",
              "ivit" + _AB + _RO_TC + "i"):
        t[s] = "iv"
    for s in ("icitate", "icitati", "icit" + _AB + "i",
              "icit" + _AB + _RO_TC + "i", "icator", "icatori",
              "iciv", "iciva", "icive", "icivi", "iciv" + _AB,
              "ical", "icala", "icale", "icali", "ical" + _AB):
        t[s] = "ic"
    for s in ("ativ", "ativa", "ative", "ativi", "ativ" + _AB,
              "a" + _RO_TC + "iune", "atoare", "ator", "atori",
              _AB + "toare", _AB + "tor", _AB + "tori"):
        t[s] = "at"
    for s in ("itiv", "itiva", "itive", "itivi", "itiv" + _AB,
              "i" + _RO_TC + "iune", "itoare", "itor", "itori"):
        t[s] = "it"
    return t


_RO_COMBO = _ro_combo_table()

_RO_STEP2_DELETE = tuple(
    base + end
    for base, ends in (
        ("at", ("", "a", _AB, "i", "e")),
        ("ut", ("", "a", _AB, "i", "e")),
        ("it", ("", "a", _AB, "i", "e")),
        ("ic", ("", "a", "e", "i", _AB)),
        ("abil", ("", "a", "e", "i", _AB)),
        ("ibil", ("", "a", "e", "i", _AB)),
        ("ant", ("", "a", "e", "i", _AB)),
        ("iv", ("", "a", "e", "i", _AB)),
    )
    for end in ends
) + ("oasa", "oas" + _AB, "oase", "os", "osi", "o" + _RO_SC + "i",
     "ator", "atori", "itate", "itati", "it" + _AB + "i",
     "it" + _AB + _RO_TC + "i")

_RO_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti",
                 "ist" + _AB, "i" + _RO_SC + "ti")
_RO_STEP2_IUNE = ("iune", "iuni")

# verb suffixes, group (a): delete if preceded by a consonant or 'u';
# group (b): delete unconditionally
_RO_VERB_A = (
    "are", "ere", "ire", _AB + "re",
    "ind", "ând", "indu", "ându",
    "eze", "easc" + _AB,
    "ez", "ezi", "eaz" + _AB, "esc", "e" + _RO_SC + "ti",
    "e" + _RO_SC + "te",
    _AB + "sc", _AB + _RO_SC + "ti", _AB + _RO_SC + "te",
    "am", "ai", "au",
    "eam", "eai", "ea", "ea" + _RO_TC + "i", "eau",
    "iam", "iai", "ia", "ia" + _RO_TC + "i", "iau",
    "ui", "u" + _RO_SC + "i", "ur" + _AB + "m",
    "ur" + _AB + _RO_TC + "i", "ur" + _AB,
    "a" + _RO_SC + "i", "ar" + _AB + "m", "ar" + _AB + _RO_TC + "i",
    "ar" + _AB,
    "i" + _RO_SC + "i", "ir" + _AB + "m", "ir" + _AB + _RO_TC + "i",
    "ir" + _AB,
    "â" + _RO_SC + "i", "âr" + _AB + "m",
    "âr" + _AB + _RO_TC + "i", "âr" + _AB, "âi",
    "im", "i" + _RO_TC + "i", "âm", "â" + _RO_TC + "i",
    "se" + _RO_SC + "ti", "se" + _RO_SC + "te", "seasc" + _AB,
    "sei", "se", "sesem", "sese" + _RO_SC + "i", "sese",
    "seser" + _AB + "m", "seser" + _AB + _RO_TC + "i", "seser" + _AB,
    "ser" + _AB + "m", "ser" + _AB + _RO_TC + "i", "ser" + _AB,
    "sem", "se" + _RO_TC + "i",
)
_RO_VERB_B = (
    "ase" + _RO_SC + "ti", "ase" + _RO_SC + "te", "aseasc" + _AB,
    "asei", "ase", "asesem", "asese" + _RO_SC + "i", "asese",
    "aseser" + _AB + "m", "aseser" + _AB + _RO_TC + "i",
    "aseser" + _AB, "aser" + _AB + "m", "aser" + _AB + _RO_TC + "i",
    "aser" + _AB, "asem", "ase" + _RO_TC + "i",
    "ise" + _RO_SC + "ti", "ise" + _RO_SC + "te", "iseasc" + _AB,
    "isei", "ise", "isesem", "isese" + _RO_SC + "i", "isese",
    "iseser" + _AB + "m", "iseser" + _AB + _RO_TC + "i",
    "iseser" + _AB, "iser" + _AB + "m", "iser" + _AB + _RO_TC + "i",
    "iser" + _AB, "isem", "ise" + _RO_TC + "i",
    "use" + _RO_SC + "ti", "use" + _RO_SC + "te", "useasc" + _AB,
    "usei", "use", "usesem", "usese" + _RO_SC + "i", "usese",
    "useser" + _AB + "m", "useser" + _AB + _RO_TC + "i",
    "useser" + _AB, "user" + _AB + "m", "user" + _AB + _RO_TC + "i",
    "user" + _AB, "usem", "use" + _RO_TC + "i",
    "âse" + _RO_SC + "ti", "âse" + _RO_SC + "te",
    "âseasc" + _AB,
    "âsei", "âse", "âsesem", "âsese" + _RO_SC + "i",
    "âsese", "âseser" + _AB + "m",
    "âseser" + _AB + _RO_TC + "i", "âseser" + _AB,
    "âser" + _AB + "m", "âser" + _AB + _RO_TC + "i",
    "âser" + _AB, "âsem", "âse" + _RO_TC + "i",
)
_RO_VOWEL_SUF = ("a", "e", "i", "ie", _AB)


def _ro_rv(word: str) -> int:
    """RV as in the Romance stemmers: if the second letter is a
    consonant, RV is after the next vowel; if the first two letters are
    vowels, after the next consonant; otherwise after the third
    letter; else the end of the word."""
    n = len(word)
    if n < 2:
        return n
    if word[1] not in _RO_V:
        for i in range(2, n):
            if word[i] in _RO_V:
                return i + 1
        return n
    if word[0] in _RO_V and word[1] in _RO_V:
        for i in range(2, n):
            if word[i] not in _RO_V:
                return i + 1
        return n
    return 3


def stem_ro(word: str) -> str:
    """Snowball Romanian (snowballstem.org/algorithms/romanian):
    prelude (i/u between vowels -> consonantal I/U), step 0 (plurals),
    repeated combining-suffix reduction + standard suffixes (R1/R2),
    verb suffixes in RV when nothing was removed, final vowel removal
    in RV, postlude."""
    word = word.replace("ș", _RO_SC).replace("ț", _RO_TC)

    # prelude: i/u between vowels are consonantal (marked uppercase)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "iu" and chars[i - 1] in _RO_V
                and chars[i + 1] in _RO_V):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1, r2 = _std_r1_r2(word, _RO_V)
    rv = _ro_rv(word)

    # step 0
    suf = _longest_in(word, r1, _RO_STEP0.keys())
    if suf is not None and not (
        suf == "ile" and word[: -3].endswith("ab")
    ):
        repl = _RO_STEP0[suf]
        word = word[: -len(suf)] + (repl or "")

    # step 1: repeat combining-suffix reduction (R1)
    removed = False
    while True:
        suf = _longest_in(word, r1, _RO_COMBO.keys())
        if suf is None:
            break
        word = word[: -len(suf)] + _RO_COMBO[suf]
        removed = True

    # step 2: standard suffixes (R2)
    suf = _longest_in(
        word, r2,
        list(_RO_STEP2_DELETE) + list(_RO_STEP2_IST)
        + list(_RO_STEP2_IUNE),
    )
    if suf is not None:
        if suf in _RO_STEP2_IUNE:
            if word[: -len(suf)].endswith(_RO_TC):
                # ţiune/ţiuni -> t
                word = word[: -len(suf) - 1] + "t"
                removed = True
        elif suf in _RO_STEP2_IST:
            word = word[: -len(suf)] + "ist"
            removed = True
        else:
            word = word[: -len(suf)]
            removed = True

    # step 3: verb suffixes (RV), only if steps 1-2 removed nothing
    if not removed:
        suf = _longest_in(word, rv, list(_RO_VERB_A) + list(_RO_VERB_B))
        if suf is not None:
            stem = word[: -len(suf)]
            if suf in _RO_VERB_B:
                word = stem
            elif (
                stem
                and len(stem) - 1 >= rv
                and (stem[-1] not in _RO_V or stem[-1] == "u")
            ):
                # group (a): preceded by a consonant or by u; the
                # preceding char must itself lie inside RV (the
                # condition sits inside the setlimit in the source)
                word = stem

    # step 4: final vowel (RV)
    suf = _longest_in(word, rv, _RO_VOWEL_SUF)
    if suf is not None:
        word = word[: -len(suf)]

    # postlude
    return word.replace("I", "i").replace("U", "u")


# ===========================================================================
# Turkish
# ===========================================================================

_TR_V = "aeıioöuü"  # a e ı i o ö u ü
# vowel harmony classes: last stem vowel -> allowed suffix vowels
_TR_HARMONY = {
    "a": "aıou", "e": "eiöü",
    "ı": "aı", "i": "ei",
    "o": "ou", "ö": "öü",
    "u": "ou", "ü": "öü",
}
_TR_U = "ıiuü"  # high vowels (U archiphoneme)
_TR_A = "ae"


def _tr_last_vowel(word: str) -> Optional[str]:
    for ch in reversed(word):
        if ch in _TR_V:
            return ch
    return None


def _tr_harmonic(stem: str, suffix_vowel: str) -> bool:
    """Vowel harmony: the suffix vowel must agree with the last vowel
    of the remaining stem (Snowball turkish check_vowel_harmony)."""
    lv = _tr_last_vowel(stem)
    if lv is None:
        return False
    return suffix_vowel in _TR_HARMONY.get(lv, "")


def _tr_first_vowel(s: str) -> Optional[str]:
    for ch in s:
        if ch in _TR_V:
            return ch
    return None


def _tr_strip(word: str, suffix: str) -> Optional[str]:
    """Strip `suffix` if it matches with vowel harmony; returns the
    stem or None."""
    if not word.endswith(suffix):
        return None
    stem = word[: -len(suffix)]
    sv = _tr_first_vowel(suffix)
    if sv is not None and not _tr_harmonic(stem, sv):
        return None
    return stem


def _tr_strip_optional(word: str, buffer: str, body: str) -> Optional[str]:
    """Suffixes with an optional buffer consonant -(y)X / -(n)X /
    -(s)X: the buffered form requires a vowel-final stem; the bare form
    requires a consonant-final stem (Snowball turkish
    mark_suffix_with_optional_*_consonant)."""
    stem = _tr_strip(word, buffer + body)
    if stem is not None and stem and stem[-1] in _TR_V:
        return stem
    stem = _tr_strip(word, body)
    if stem is not None and stem and stem[-1] not in _TR_V:
        return stem
    return None


def _tr_variants(template: str) -> List[str]:
    """Expand an archiphoneme template: U -> ı/i/u/ü, A -> a/e,
    D -> d/t, C -> c/ç."""
    outs = [""]
    for ch in template:
        if ch == "U":
            outs = [o + v for o in outs for v in _TR_U]
        elif ch == "A":
            outs = [o + v for o in outs for v in _TR_A]
        elif ch == "D":
            outs = [o + c for o in outs for c in "dt"]
        elif ch == "C":
            outs = [o + c for o in outs for c in ("c", "ç")]
        else:
            outs = [o + ch for o in outs]
    return outs


@lru_cache(maxsize=None)
def _tr_expansions(templates: tuple) -> tuple:
    """Sorted archiphoneme expansions, computed once per template set
    (the stemmer runs per token inside the analyzer UDF — rebuilding
    and re-sorting these lists per call is pure repeated work)."""
    cands: List[str] = []
    for t in templates:
        cands.extend(_tr_variants(t))
    cands.sort(key=len, reverse=True)
    return tuple(cands)


def _tr_try(word: str, templates: Sequence[str],
            buffer: str = "") -> Optional[str]:
    """Try every expansion of every template (longest first); with a
    buffer letter, apply the optional-consonant rule."""
    cands = _tr_expansions(tuple(templates))
    for c in cands:
        if buffer:
            stem = _tr_strip_optional(word, buffer, c)
        else:
            stem = _tr_strip(word, c)
        if stem is not None:
            return stem
    return None


def stem_tr(word: str) -> str:
    """Snowball Turkish (snowballstem.org/algorithms/turkish, after
    E. K. Cilden's published algorithm): only words with more than one
    syllable are stemmed; nominal verb suffixes then noun suffixes are
    stripped under vowel-harmony and optional-buffer-consonant rules;
    finally word-final b/c/d/ğ devoice to p/ç/t/k."""
    if sum(1 for ch in word if ch in _TR_V) <= 1:
        return word

    # stage 1: nominal verb suffixes ------------------------------------
    # (order follows the snowball routine: each group tried once;
    # some groups stop further nominal stripping)
    w = word
    while True:
        # -(y)Um / -sUn / -(y)Uz / -sUnUz / -lAr / -m / -n / -k / -nUz
        s = _tr_try(w, ["Um"], buffer="y")
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["sUn"])
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["Uz"], buffer="y")
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["sUnUz"])
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["lAr"])
        if s is not None:
            w = s
            # -lAr may be followed by -DUr etc already stripped; after
            # lAr the nominal chain can continue with -(y)DU/-(y)sA...
            s2 = _tr_try(w, ["DUr", "DU", "sA", "mUş"])
            if s2 is not None:
                w = s2
            break
        s = _tr_try(w, ["nUz"])
        if s is not None:
            w = s
            s2 = _tr_try(w, ["DU", "sA"])
            if s2 is not None:
                w = s2
            break
        s = _tr_try(w, ["m", "n", "k"])
        if s is not None and _tr_last_vowel(s) is not None:
            # bare person markers only after tense vowels: require a
            # preceding DU/sA/mUş/ken chain to actually match
            s2 = _tr_try(s, ["DU", "sA", "mUş", "ken"], buffer="y")
            if s2 is not None:
                w = s2
                break
        s = _tr_try(w, ["DUr"])
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["cAsInA"])
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["DU"], buffer="y")
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["sA"], buffer="y")
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["mUş"], buffer="y")
        if s is not None:
            w = s
            break
        s = _tr_try(w, ["ken"], buffer="y")
        if s is not None:
            w = s
            break
        break

    # stage 2: noun suffixes --------------------------------------------
    changed = True
    while changed:
        changed = False
        # possessives and case endings, longest-ish first
        for templates, buf in (
                (["lArU"], ""),          # 3pl possessive -lArI (ları/leri)
                (["UmUz"], ""),          # 1pl possessive (ımız...)
                (["UnUz"], ""),          # 2pl possessive
                (["lAr"], ""),           # plural
                (["nDAn"], ""),          # ablative after possessive
                (["DAn"], ""),           # ablative
                (["nDA"], ""),           # locative after possessive
                (["DA"], ""),            # locative
                (["nUn"], ""),           # genitive after possessive
                (["Un"], "n"),           # genitive -(n)Un
                (["lA"], "y"),           # instrumental -(y)lA
                (["nA"], ""),            # dative after possessive
                (["A"], "y"),            # dative -(y)A
                (["nU"], ""),            # accusative after possessive
                (["U"], "s"),            # 3sg possessive -(s)U
                (["U"], "y"),            # accusative -(y)U
                (["Um"], ""),            # 1sg possessive
                (["Un"], ""),            # 2sg possessive
                (["ki"], ""),            # relative -ki
                (["cA"], "n"),           # equative -(n)cA
            ):
                s = _tr_try(w, templates, buffer=buf)
                if s is not None and _tr_last_vowel(s) is not None:
                    w = s
                    changed = True
                    break

    # post-process: final devoicing b->p c->ç d->t ğ->k
    if w and w[-1] in "bcdğ":
        w = w[:-1] + {"b": "p", "c": "ç", "d": "t",
                      "ğ": "k"}[w[-1]]
    return w if w else word


# ---------------------------------------------------------------------------
# registration


def _term_filter(fn):
    def filt(tokens: List[Token]) -> List[Token]:
        return [(fn(t), p, s, e) for t, p, s, e in tokens]

    return filt


snowball_fi_filter = _term_filter(stem_fi)
snowball_hu_filter = _term_filter(stem_hu)
snowball_ro_filter = _term_filter(stem_ro)
snowball_tr_filter = _term_filter(stem_tr)


def register_ext_snowball_analyzers():
    from . import Analyzer, register_analyzer
    from .filters import apostrophe_filter, lowercase_filter
    from .lang_extra import stop_filter
    from .tokenizers import unicode_tokenize

    for name, stemmer in (
        ("fi", snowball_fi_filter),  # ref: lang/fi/analyzer_fi.go
        ("hu", snowball_hu_filter),  # ref: lang/hu/analyzer_hu.go
        ("ro", snowball_ro_filter),  # ref: lang/ro/analyzer_ro.go
    ):
        register_analyzer(
            Analyzer(
                name,
                unicode_tokenize,
                token_filters=[
                    lowercase_filter,
                    stop_filter(name),
                    stemmer,
                ],
            )
        )
    register_analyzer(
        Analyzer(  # ref: lang/tr/analyzer_tr.go (apostrophe first)
            "tr",
            unicode_tokenize,
            token_filters=[
                apostrophe_filter,
                lowercase_filter,
                stop_filter("tr"),
                snowball_tr_filter,
            ],
        )
    )

