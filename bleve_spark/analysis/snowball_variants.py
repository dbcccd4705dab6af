"""Snowball stemmers: French, German, Spanish, Italian — the reference's
*_snowball stemmer variants — plus the French minimal stemmer.

The reference registers BOTH a light stemmer (each language pack's
default chain) and a full Snowball stemmer for these languages
(ref: analysis/lang/fr/stemmer_fr_snowball.go, minimal_stemmer_fr.go,
analysis/lang/{de,es,it}/stemmer_*_snowball.go, importing
github.com/blevesearch/snowballstem). Re-implemented here from the
published Snowball algorithm definitions (snowballstem.org french/
german/spanish/italian stemmer descriptions); verified against the
reference's stemmer_*_snowball_test.go vectors and differentially
against PostgreSQL's Snowball-generated {french,german,spanish,
italian}_stem dictionaries over stop-word + suffix-product corpora
(tools/snowball_difftest.py).

All stemmers expect lowercased input (the reference chains lowercase
first)."""

from __future__ import annotations

from typing import List, Optional

from .tokenizers import Token


def _longest_suffix(word: str, suffixes) -> Optional[str]:
    """True Snowball `among` semantics: the longest suffix of `word`
    from the list wins and its rule alone is applied — region/condition
    failures do NOT fall back to a shorter suffix."""
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _std_r1_r2(word: str, vowels: str) -> tuple:
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


def _in(word: str, start: int, suffix: str) -> bool:
    """suffix lies wholly inside word[start:]."""
    return len(word) - len(suffix) >= start


# ===========================================================================
# French
# ===========================================================================

_FR_V = "aeiouyâàëéêèïîôûù"

_FR_STEP1 = (
    "ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes",
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
    "logie", "logies", "usion", "ution", "usions", "utions",
    "ence", "ences", "ement", "ements", "ité", "ités",
    "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
    "issement", "issements", "amment", "emment", "ment", "ments",
)
_FR_STEP1_DEL_R2 = {
    "ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes",
}
_FR_STEP1_ATEUR = {
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
}
_FR_STEP2A = (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
)
_FR_STEP2B_ER = {
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
    "eront", "ez", "iez",
}
_FR_STEP2B_A = {
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
    "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions",
}
_FR_STEP2B = ("ions",) + tuple(_FR_STEP2B_ER) + tuple(_FR_STEP2B_A)


def _fr_prelude(word: str) -> str:
    out: List[str] = []
    i, n = 0, len(word)
    while i < n:
        c = word[i]
        prev_v = bool(out) and out[-1] in _FR_V
        # NB: "" would be `in` any vowel string — use a non-letter sentinel
        nxt = word[i + 1] if i + 1 < n else "\x00"
        if c == "ë":
            out.append("H")
            out.append("e")
        elif c == "ï":
            out.append("H")
            out.append("i")
        elif c in "ui" and prev_v and nxt in _FR_V:
            out.append(c.upper())
        elif c == "y" and (prev_v or nxt in _FR_V):
            out.append("Y")
        elif c == "u" and out and out[-1] == "q":
            out.append("U")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _fr_rv(word: str) -> int:
    n = len(word)
    if word[:3] in ("par", "col", "tap"):
        return min(3, n)
    if n >= 2 and word[0] in _FR_V and word[1] in _FR_V:
        return min(3, n)
    for i in range(1, n):
        if word[i] in _FR_V:
            return i + 1
    return n


def _fr_step1(word: str, r1: int, r2: int, rv: int):
    """-> (word, status): status None (nothing matched/changed),
    'std' (standard change), 'ment' (a ment-family suffix removed)."""
    suf = _longest_suffix(word, _FR_STEP1)
    if suf is None:
        return word, None
    base = word[: len(word) - len(suf)]
    if suf in _FR_STEP1_DEL_R2:
        if _in(word, r2, suf):
            return base, "std"
        return word, None
    if suf in _FR_STEP1_ATEUR:
        if not _in(word, r2, suf):
            return word, None
        w = base
        if w.endswith("ic"):
            if _in(w, r2, "ic"):
                w = w[:-2]
            else:
                w = w[:-2] + "iqU"
        return w, "std"
    if suf in ("logie", "logies"):
        if _in(word, r2, suf):
            return base + "log", "std"
        return word, None
    if suf in ("usion", "ution", "usions", "utions"):
        if _in(word, r2, suf):
            return base + "u", "std"
        return word, None
    if suf in ("ence", "ences"):
        if _in(word, r2, suf):
            return base + "ent", "std"
        return word, None
    if suf in ("ement", "ements"):
        if not _in(word, rv, suf):
            return word, None
        w = base
        if w.endswith("iv") and _in(w, r2, "iv"):
            w = w[:-2]
            if w.endswith("at") and _in(w, r2, "at"):
                w = w[:-2]
        elif w.endswith("eus"):
            if _in(w, r2, "eus"):
                w = w[:-3]
            elif _in(w, r1, "eus"):
                w = w[:-3] + "eux"
        elif w.endswith("abl") and _in(w, r2, "abl"):
            w = w[:-3]
        elif w.endswith("iqU") and _in(w, r2, "iqU"):
            w = w[:-3]
        elif w.endswith("ièr") and _in(w, rv, "ièr"):
            w = w[:-3] + "i"
        elif w.endswith("Ièr") and _in(w, rv, "Ièr"):
            w = w[:-3] + "i"
        return w, "std"
    if suf in ("ité", "ités"):
        if not _in(word, r2, suf):
            return word, None
        w = base
        if w.endswith("abil"):
            if _in(w, r2, "abil"):
                w = w[:-4]
            else:
                w = w[:-4] + "abl"
        elif w.endswith("ic"):
            if _in(w, r2, "ic"):
                w = w[:-2]
            else:
                w = w[:-2] + "iqU"
        elif w.endswith("iv") and _in(w, r2, "iv"):
            w = w[:-2]
        return w, "std"
    if suf in ("if", "ive", "ifs", "ives"):
        if not _in(word, r2, suf):
            return word, None
        w = base
        if w.endswith("at") and _in(w, r2, "at"):
            w = w[:-2]
            if w.endswith("ic"):
                if _in(w, r2, "ic"):
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        return w, "std"
    if suf == "eaux":
        return base + "eau", "std"
    if suf == "aux":
        if _in(word, r1, suf):
            return base + "al", "std"
        return word, None
    if suf in ("euse", "euses"):
        if _in(word, r2, suf):
            return base, "std"
        if _in(word, r1, suf):
            return base + "eux", "std"
        return word, None
    if suf in ("issement", "issements"):
        if _in(word, r1, suf) and base and base[-1] not in _FR_V:
            return base, "std"
        return word, None
    if suf == "amment":
        if _in(word, rv, suf):
            return base + "ant", "ment"
        return word, None
    if suf == "emment":
        if _in(word, rv, suf):
            return base + "ent", "ment"
        return word, None
    if suf in ("ment", "ments"):
        # delete if preceded by a vowel in RV (the vowel itself in RV)
        if base and base[-1] in _FR_V and _in(word, rv, base[-1] + suf):
            return base, "ment"
        return word, None
    return word, None


def stem_fr(word: str) -> str:
    """Snowball French (snowballstem.org/algorithms/french/stemmer.html;
    ref consumes it as stemmer_fr_snowball, lang/fr/stemmer_fr_snowball.go)."""
    if len(word) <= 2:
        return word
    w = _fr_prelude(word)
    r1, r2 = _std_r1_r2(w, _FR_V)
    rv = _fr_rv(w)

    w1, st1 = _fr_step1(w, r1, r2, rv)
    last_altered = st1 is not None
    w = w1
    if st1 is None or st1 == "ment":
        # step 2a: i-verb suffixes, in RV, preceded by a non-vowel
        # (that non-vowel itself in RV, and not 'H' — He/Hi encode ë/ï)
        rvw = w[rv:]
        suf = _longest_suffix(rvw, _FR_STEP2A)
        done2a = False
        if suf is not None and len(rvw) - len(suf) >= 1:
            p = rvw[-len(suf) - 1]
            if p not in _FR_V and p != "H":
                w = w[: len(w) - len(suf)]
                done2a = True
        if done2a:
            last_altered = True
        else:
            # step 2b
            rvw = w[rv:]
            suf = _longest_suffix(rvw, _FR_STEP2B)
            last_altered = False
            if suf == "ions":
                if _in(w, r2, "ions"):
                    w = w[:-4]
                    last_altered = True
            elif suf in _FR_STEP2B_ER:
                w = w[: len(w) - len(suf)]
                last_altered = True
            elif suf in _FR_STEP2B_A:
                w = w[: len(w) - len(suf)]
                last_altered = True
                if w.endswith("e") and _in(w, rv, "e"):
                    w = w[:-1]

    if last_altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4 (residual)
        if w.endswith("s"):
            p = w[-2] if len(w) >= 2 else ""
            if p not in "aiouès" or w.endswith("His"):
                w = w[:-1]
        rvw = w[rv:]
        suf = _longest_suffix(rvw, ("ion", "ier", "ière", "Ier", "Ière", "e"))
        if suf == "ion":
            if _in(w, r2, "ion") and len(rvw) - 3 >= 1 and rvw[-4] in "st":
                w = w[:-3]
        elif suf in ("ier", "ière", "Ier", "Ière"):
            w = w[: len(w) - len(suf)] + "i"
        elif suf == "e":
            w = w[:-1]

    # step 5: un-double
    for dd in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(dd):
            w = w[:-1]
            break
    # step 6: un-accent (é/è + >=1 non-vowel at the end)
    i = len(w) - 1
    k = 0
    while i >= 0 and w[i] not in _FR_V:
        i -= 1
        k += 1
    if k >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]
    # postlude
    w = (
        w.replace("I", "i").replace("U", "u").replace("Y", "y")
        .replace("He", "ë").replace("Hi", "ï").replace("H", "")
    )
    return w


def stem_fr_min(word: str) -> str:
    """French minimal stemmer (ref: lang/fr/minimal_stemmer_fr.go —
    Lucene FrenchMinimalStemmer)."""
    if len(word) < 6:
        return word
    w = list(word)
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            w[-2] = "l"
        return "".join(w[:-1])
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2]:
        w = w[:-1]
    return "".join(w)


# ===========================================================================
# Spanish
# ===========================================================================

_ES_V = "aeiouáéíóúü"

_ES_PRONOUNS = (
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos",
)
_ES_PRE_ACC = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
               "ér": "er", "ír": "ir"}
_ES_PRE_PLAIN = ("ando", "iendo", "ar", "er", "ir")

_ES_STEP1_DEL_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_STEP1_ADOR = (
    "adora", "ador", "ación", "adoras", "adores", "aciones",
    "ante", "antes", "ancia", "ancias",
)
_ES_STEP1 = _ES_STEP1_DEL_R2 + _ES_STEP1_ADOR + (
    "logía", "logías", "ución", "uciones", "encia", "encias",
    "amente", "mente", "idad", "idades", "iva", "ivo", "ivas", "ivos",
)
_ES_STEP2A = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas",
    "yes", "yais", "yamos",
)
_ES_STEP2B_GU = ("en", "es", "éis", "emos")
_ES_STEP2B = _ES_STEP2B_GU + (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
    "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
    "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
    "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
    "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
    "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er",
    "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
    "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
    "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
    "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
    "ásemos",
)
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _es_rv(word: str, vowels: str) -> int:
    """Spanish/Italian/Portuguese RV definition."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        # second letter consonant: after the next following vowel
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        # first two letters vowels: after the next consonant
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    # consonant-vowel: after the third letter
    return 3


def _es_step0(word: str, rv: int) -> str:
    suf = _longest_suffix(word, _ES_PRONOUNS)
    if suf is None:
        return word
    base = word[: len(word) - len(suf)]
    pre = _longest_suffix(base, tuple(_ES_PRE_ACC) + _ES_PRE_PLAIN + ("yendo",))
    if pre is None or not _in(base, rv, pre):
        return word
    if pre in _ES_PRE_ACC:
        return base[: len(base) - len(pre)] + _ES_PRE_ACC[pre]
    if pre == "yendo":
        stem = base[: len(base) - len(pre)]
        if stem.endswith("u"):
            return base
        return word
    return base  # plain ando/iendo/ar/er/ir


def _es_step1(word: str, r1: int, r2: int):
    suf = _longest_suffix(word, _ES_STEP1)
    if suf is None:
        return word, False
    base = word[: len(word) - len(suf)]
    if suf in _ES_STEP1_DEL_R2:
        if _in(word, r2, suf):
            return base, True
        return word, False
    if suf in _ES_STEP1_ADOR:
        if not _in(word, r2, suf):
            return word, False
        w = base
        if w.endswith("ic") and _in(w, r2, "ic"):
            w = w[:-2]
        return w, True
    if suf in ("logía", "logías"):
        if _in(word, r2, suf):
            return base + "log", True
        return word, False
    if suf in ("ución", "uciones"):
        if _in(word, r2, suf):
            return base + "u", True
        return word, False
    if suf in ("encia", "encias"):
        if _in(word, r2, suf):
            return base + "ente", True
        return word, False
    if suf == "amente":
        if not _in(word, r1, suf):
            return word, False
        w = base
        if w.endswith("iv") and _in(w, r2, "iv"):
            w = w[:-2]
            if w.endswith("at") and _in(w, r2, "at"):
                w = w[:-2]
        else:
            for p in ("os", "ic", "ad"):
                if w.endswith(p) and _in(w, r2, p):
                    w = w[:-2]
                    break
        return w, True
    if suf == "mente":
        if not _in(word, r2, suf):
            return word, False
        w = base
        for p in ("ante", "able", "ible"):
            if w.endswith(p) and _in(w, r2, p):
                w = w[: len(w) - len(p)]
                break
        return w, True
    if suf in ("idad", "idades"):
        if not _in(word, r2, suf):
            return word, False
        w = base
        for p in ("abil", "ic", "iv"):
            if w.endswith(p) and _in(w, r2, p):
                w = w[: len(w) - len(p)]
                break
        return w, True
    if suf in ("iva", "ivo", "ivas", "ivos"):
        if not _in(word, r2, suf):
            return word, False
        w = base
        if w.endswith("at") and _in(w, r2, "at"):
            w = w[:-2]
        return w, True
    return word, False


def stem_es(word: str) -> str:
    """Snowball Spanish (snowballstem.org/algorithms/spanish/stemmer.html;
    ref consumes it as stemmer_es_snowball, lang/es/stemmer_es_snowball.go)."""
    if len(word) <= 2:
        return word.translate(_ES_UNACCENT)
    w = _es_step0(word, _es_rv(word, _ES_V))
    r1, r2 = _std_r1_r2(w, _ES_V)
    rv = _es_rv(w, _ES_V)
    w1, removed = _es_step1(w, r1, r2)
    w = w1
    if not removed:
        # step 2a: y-verb suffixes in RV preceded by u
        rvw = w[rv:]
        suf = _longest_suffix(rvw, _ES_STEP2A)
        done2a = False
        if suf is not None:
            base = w[: len(w) - len(suf)]
            if base.endswith("u"):
                w = base
                done2a = True
        if not done2a:
            rvw = w[rv:]
            suf = _longest_suffix(rvw, _ES_STEP2B)
            if suf is not None:
                w = w[: len(w) - len(suf)]
                if suf in _ES_STEP2B_GU and w.endswith("gu"):
                    w = w[:-1]
    # step 3: residual
    rvw = w[rv:]
    suf = _longest_suffix(rvw, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if suf in ("os", "a", "o", "á", "í", "ó"):
        w = w[: len(w) - len(suf)]
    elif suf in ("e", "é"):
        w = w[:-1]
        if w.endswith("gu") and _in(w, rv, "u"):
            w = w[:-1]
    return w.translate(_ES_UNACCENT)


# ===========================================================================
# Italian
# ===========================================================================

_IT_V = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRONOUNS = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
)
_IT_STEP1_DEL_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
    "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
    "ose", "mente", "atrice", "atrici", "ante", "anti",
)
_IT_STEP1 = _IT_STEP1_DEL_R2 + (
    "azione", "azioni", "atore", "atori", "logia", "logie",
    "uzione", "uzioni", "usione", "usioni", "enza", "enze",
    "amento", "amenti", "imento", "imenti", "amente", "ità",
    "ivo", "ivi", "iva", "ive",
)
_IT_STEP2 = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
    "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
    "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
    "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def _it_prelude(word: str) -> str:
    word = word.translate(_IT_ACUTE)
    out: List[str] = []
    n = len(word)
    for i, c in enumerate(word):
        prev_v = bool(out) and out[-1] in _IT_V
        nxt = word[i + 1] if i + 1 < n else "\x00"
        if c in "ui" and prev_v and nxt in _IT_V:
            out.append(c.upper())
        elif c == "u" and out and out[-1] == "q":
            out.append("U")
        else:
            out.append(c)
    return "".join(out)


def _it_step0(word: str, rv: int) -> str:
    suf = _longest_suffix(word, _IT_PRONOUNS)
    if suf is None:
        return word
    base = word[: len(word) - len(suf)]
    pre = _longest_suffix(base, ("ando", "endo", "ar", "er", "ir"))
    if pre is None or not _in(base, rv, pre):
        return word
    if pre in ("ando", "endo"):
        return base
    return base[: len(base) - len(pre)] + pre + "e"


def _it_step1(word: str, r1: int, r2: int, rv: int):
    suf = _longest_suffix(word, _IT_STEP1)
    if suf is None:
        return word, False
    base = word[: len(word) - len(suf)]
    if suf in _IT_STEP1_DEL_R2:
        if _in(word, r2, suf):
            return base, True
        return word, False
    if suf in ("azione", "azioni", "atore", "atori"):
        if not _in(word, r2, suf):
            return word, False
        w = base
        if w.endswith("ic") and _in(w, r2, "ic"):
            w = w[:-2]
        return w, True
    if suf in ("logia", "logie"):
        if _in(word, r2, suf):
            return base + "log", True
        return word, False
    if suf in ("uzione", "uzioni", "usione", "usioni"):
        if _in(word, r2, suf):
            return base + "u", True
        return word, False
    if suf in ("enza", "enze"):
        if _in(word, r2, suf):
            return base + "ente", True
        return word, False
    if suf in ("amento", "amenti", "imento", "imenti"):
        if _in(word, rv, suf):
            return base, True
        return word, False
    if suf == "amente":
        if not _in(word, r1, suf):
            return word, False
        w = base
        if w.endswith("iv") and _in(w, r2, "iv"):
            w = w[:-2]
            if w.endswith("at") and _in(w, r2, "at"):
                w = w[:-2]
        else:
            for p in ("os", "ic"):
                if w.endswith(p) and _in(w, r2, p):
                    w = w[:-2]
                    break
            else:
                if w.endswith("abil") and _in(w, r2, "abil"):
                    w = w[:-4]
        return w, True
    if suf == "ità":
        if not _in(word, r2, suf):
            return word, False
        w = base
        for p in ("abil", "ic", "iv"):
            if w.endswith(p) and _in(w, r2, p):
                w = w[: len(w) - len(p)]
                break
        return w, True
    if suf in ("ivo", "ivi", "iva", "ive"):
        if not _in(word, r2, suf):
            return word, False
        w = base
        if w.endswith("at") and _in(w, r2, "at"):
            w = w[:-2]
            if w.endswith("ic") and _in(w, r2, "ic"):
                w = w[:-2]
        return w, True
    return word, False


def stem_it(word: str) -> str:
    """Snowball Italian (snowballstem.org/algorithms/italian/stemmer.html;
    ref consumes it as stemmer_it_snowball, lang/it/stemmer_it_snowball.go)."""
    if len(word) <= 2:
        return word.translate(_IT_ACUTE)
    w = _it_prelude(word)
    rv = _es_rv(w, _IT_V)
    r1, r2 = _std_r1_r2(w, _IT_V)
    w = _it_step0(w, rv)
    w1, removed = _it_step1(w, r1, r2, rv)
    w = w1
    if not removed:
        rvw = w[rv:]
        suf = _longest_suffix(rvw, _IT_STEP2)
        if suf is not None:
            w = w[: len(w) - len(suf)]
    # step 3a: final vowel (and preceding i) in RV
    if w and w[-1] in "aeioàèìò" and _in(w, rv, w[-1]):
        w = w[:-1]
        if w.endswith("i") and _in(w, rv, "i"):
            w = w[:-1]
    # step 3b
    if (w.endswith("ch") or w.endswith("gh")) and _in(w, rv, w[-2:]):
        w = w[:-1]
    return w.replace("U", "u").replace("I", "i").replace("Y", "y")


# ===========================================================================
# German
# ===========================================================================

_DE_V = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def _de_prelude(word: str) -> str:
    word = word.replace("ß", "ss")
    out: List[str] = []
    n = len(word)
    for i, c in enumerate(word):
        prev_v = bool(out) and out[-1].lower() in _DE_V
        nxt = word[i + 1] if i + 1 < n else "\x00"
        if c in "uy" and prev_v and nxt in _DE_V:
            out.append(c.upper())
        else:
            out.append(c)
    return "".join(out)


def stem_de(word: str) -> str:
    """Snowball German (snowballstem.org/algorithms/german/stemmer.html;
    ref consumes it as stemmer_de_snowball, lang/de/stemmer_de_snowball.go)."""
    w = _de_prelude(word)
    r1, r2 = _std_r1_r2(w, _DE_V)
    r1 = max(r1, min(3, len(w)))  # region before R1 must cover >=3 letters

    # step 1
    suf = _longest_suffix(w, ("em", "ern", "er", "e", "en", "es", "s"))
    if suf in ("em", "ern", "er"):
        if _in(w, r1, suf):
            w = w[: len(w) - len(suf)]
    elif suf in ("e", "en", "es"):
        if _in(w, r1, suf):
            w = w[: len(w) - len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
    elif suf == "s":
        if _in(w, r1, "s") and len(w) >= 2 and w[-2] in _DE_S_END:
            w = w[:-1]

    # step 2
    suf = _longest_suffix(w, ("en", "er", "est", "st"))
    if suf in ("en", "er", "est"):
        if _in(w, r1, suf):
            w = w[: len(w) - len(suf)]
    elif suf == "st":
        if (
            _in(w, r1, "st")
            and len(w) >= 6
            and w[-3] in _DE_ST_END
        ):
            w = w[:-2]

    # step 3: d-suffixes
    suf = _longest_suffix(w, ("end", "ung", "ig", "ik", "isch", "lich",
                              "heit", "keit"))
    if suf in ("end", "ung"):
        if _in(w, r2, suf):
            w = w[: len(w) - len(suf)]
            if (
                w.endswith("ig")
                and _in(w, r2, "ig")
                and not w.endswith("eig")
            ):
                w = w[:-2]
    elif suf in ("ig", "ik", "isch"):
        if _in(w, r2, suf) and not w[: len(w) - len(suf)].endswith("e"):
            w = w[: len(w) - len(suf)]
    elif suf in ("lich", "heit"):
        if _in(w, r2, suf):
            w = w[: len(w) - len(suf)]
            for p in ("er", "en"):
                if w.endswith(p) and _in(w, r1, p):
                    w = w[:-2]
                    break
    elif suf == "keit":
        if _in(w, r2, suf):
            w = w[: len(w) - len(suf)]
            for p in ("lich", "ig"):
                if w.endswith(p) and _in(w, r2, p):
                    w = w[: len(w) - len(p)]
                    break

    return (
        w.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# ---------------------------------------------------------------------------
# token-filter adapters + registration


def _term_filter(fn):
    def filt(tokens: List[Token]) -> List[Token]:
        return [(fn(t), p, s, e) for t, p, s, e in tokens]

    return filt


snowball_fr_filter = _term_filter(stem_fr)
snowball_de_filter = _term_filter(stem_de)
snowball_es_filter = _term_filter(stem_es)
snowball_it_filter = _term_filter(stem_it)
minimal_fr_filter = _term_filter(stem_fr_min)
