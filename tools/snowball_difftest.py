"""Differential test of snowball_variants stemmers against PostgreSQL's
Snowball-generated dictionaries (french_stem/german_stem/spanish_stem/
italian_stem — generated from the same published Snowball sources the
reference's snowballstem Go module is).

Needs a local postgres (see round-4 notes):
  su nobody -s /bin/sh -c "initdb -D /tmp/pgsnow/data -U snow"
  su nobody -s /bin/sh -c "pg_ctl -D /tmp/pgsnow/data \
      -o '-p 54329 -k /tmp/pgsnow' -l /tmp/pgsnow/log start"

Usage: python tools/snowball_difftest.py [lang ...]
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, ".")

from bleve_spark.analysis.porter2 import porter2_stem
from bleve_spark.analysis.snowball_variants import (
    stem_de, stem_es, stem_fr, stem_it,
)

STOP = "/usr/share/postgresql/15/tsearch_data/{}.stop"
SAMPLES = {
    "french": [
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
        "charset_normalizer/data/sample-french.txt",
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
        "charset_normalizer/data/sample-french-1.txt",
    ],
    "spanish": [
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
        "charset_normalizer/data/sample-spanish.txt",
    ],
}

# roots x suffixes exercise every rule path even without a dictionary
ROOTS = {
    "french": ["antagon", "barbouill", "calcul", "continu", "pay",
               "voy", "ennu", "major", "nation", "politiqu", "batt",
               "plong", "conten", "sent", "parl", "envahiss", "tranqu",
               "chevaler", "essentiel", "affect", "commun", "tap",
               "colomb", "particip"],
    "german": ["aufeinander", "schreck", "wart", "zynik", "fabrik",
               "kategor", "verbind", "schnell", "ordnungs", "beweg",
               "aberwitz", "mögl", "verständ", "wirk", "einkommen"],
    "spanish": ["agres", "tortur", "comun", "nacional", "practic",
                "torer", "cumpl", "gust", "habl", "cant", "perr",
                "guerr", "averigu", "critic", "salud"],
    "italian": ["aizz", "abbandon", "pront", "propag", "vetr",
                "forz", "critic", "color", "ammir", "mangi", "fin",
                "logic", "nazional", "sent"],
    "english": ["generat", "generic", "communicat", "arsenic",
                "nation", "relat", "condition", "critic", "hope",
                "hop", "luxuri", "ti", "cr", "happ", "tradition",
                "abil", "sensit", "activ", "bell", "controll",
                "skis", "skies", "dying", "lying", "tying", "idly",
                "gently", "ugly", "early", "only", "singly", "sky",
                "news", "howe", "atlas", "cosmos", "bias", "andes",
                "inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed", "tie", "gas", "gap",
                "kiwi", "by", "say"],
}
SUFFIXES = {
    "french": ["er", "ait", "ez", "ons", "ement", "ements", "ation",
               "ations", "ateur", "atrice", "eux", "euse", "euses",
               "ique", "iques", "isme", "able", "iste", "ance", "ence",
               "ité", "ités", "if", "ive", "ives", "eaux", "aux",
               "issement", "amment", "emment", "ment", "ments", "ion",
               "ions", "ier", "ière", "é", "ée", "ées", "és", "èrent",
               "era", "erai", "erais", "erait", "eriez", "erions",
               "eront", "ant", "ante", "antes", "ants", "asse",
               "assent", "asses", "assiez", "assions", "ir", "issait",
               "issant", "isse", "issent", "it", "ît", "i", "ie",
               "ies", "is", "e", "es", "s", "elle", "ette", "enne",
               "onne", "eille", "y", "ya", "u", "ou", "oui", "uie"],
    "german": ["", "e", "em", "en", "ern", "er", "es", "s", "est",
               "st", "end", "ung", "ig", "ik", "isch", "lich", "heit",
               "keit", "igkeit", "lichkeit", "ungen", "igung", "igen",
               "ischen", "erheit", "enheit", "licher", "endes",
               "ernst", "nisse", "nisses", "endung"],
    "spanish": ["", "o", "os", "a", "as", "anza", "anzas", "ico",
                "icos", "ismo", "able", "ible", "ista", "oso",
                "amiento", "imiento", "adora", "ador", "ación",
                "aciones", "ante", "ancia", "logía", "ución", "encia",
                "amente", "mente", "idad", "idades", "iva", "ivo",
                "aba", "ada", "ía", "ara", "iera", "ase", "iese",
                "aste", "an", "aban", "aron", "ieron", "ando",
                "iendo", "ió", "ar", "er", "ir", "ás", "án", "é",
                "emos", "éis", "en", "es", "ué", "güe", "gües", "ya",
                "yendo", "uyendo", "uyó", "selo", "sela", "ándoselo",
                "árselo", "iéndose", "arse", "erse", "irse", "arme",
                "ándome", "ándola", "iéndolos"],
    "italian": ["", "o", "i", "a", "e", "anza", "anze", "ico", "ici",
                "iche", "ismo", "abile", "ibile", "ista", "oso",
                "mente", "atrice", "ante", "azione", "azioni",
                "atore", "logia", "uzione", "usione", "enza",
                "amento", "imento", "amente", "ità", "ivo", "iva",
                "ammo", "ando", "ano", "are", "arono", "asse",
                "assero", "ata", "ate", "ati", "ato", "ava", "avamo",
                "endo", "erà", "eranno", "ere", "erebbe", "eremo",
                "erò", "erono", "ete", "eva", "iamo", "immo", "irà",
                "ire", "irono", "isca", "isce", "isco", "iscono",
                "ita", "ito", "iva", "ono", "uta", "uto", "ar", "ir",
                "arsi", "arci", "andolo", "andogli", "arla", "erla",
                "irle", "endone", "ch", "chi", "ghi", "cchio",
                "cchi", "glielo", "gliene", "arglielo"],
    "english": ["", "e", "s", "es", "ed", "edly", "ing", "ingly",
                "ies", "ied", "sses", "y", "ly", "ally", "ation",
                "ations", "ational", "izer", "ization", "iveness",
                "ousness", "fulness", "biliti", "bli", "ogi", "li",
                "ement", "ment", "ent", "ance", "ence", "able",
                "ible", "ant", "ism", "ate", "iti", "ous", "ive",
                "ize", "ion", "tional", "enci", "anci", "abli",
                "entli", "alism", "aliti", "alli", "ousli", "iviti",
                "fulli", "lessli", "alize", "icate", "iciti", "ical",
                "ful", "ness", "ative", "eed", "eedly", "'s", "'s'",
                "'", "ys", "ying"],
}

STEMMERS = {
    "french": stem_fr,
    "german": stem_de,
    "spanish": stem_es,
    "italian": stem_it,
    "english": porter2_stem,
}


def words_for(lang: str) -> list:
    words = set()
    try:
        with open(STOP.format(lang)) as f:
            words.update(w.strip() for w in f if w.strip())
    except OSError:
        pass
    for path in SAMPLES.get(lang, []):
        try:
            with open(path, encoding="utf-8", errors="ignore") as f:
                for tok in f.read().split():
                    t = "".join(c for c in tok.lower() if c.isalpha())
                    if len(t) > 2:
                        words.add(t)
        except OSError:
            pass
    for r in ROOTS[lang]:
        for s in SUFFIXES[lang]:
            words.add(r + s)
    return sorted(words)


def pg_stems(lang: str, words: list) -> list:
    # ts_lexize returns NULL-ish empty for stop words the dictionary
    # swallows — mark those SKIP, they are not stemmer outputs
    sql_lines = "\n".join(
        "SELECT COALESCE((ts_lexize('{}_stem', '{}'))[1], '<SKIP>');".format(
            lang, w.replace("'", "''")
        )
        for w in words
    )
    out = subprocess.run(
        ["psql", "-h", "/tmp/pgsnow", "-p", "54329", "-U", "snow",
         "-d", "postgres", "-At"],
        input=sql_lines, capture_output=True, text=True, check=True,
    )
    return out.stdout.splitlines()


def main():
    langs = sys.argv[1:] or list(STEMMERS)
    total_bad = 0
    for lang in langs:
        words = words_for(lang)
        gold = pg_stems(lang, words)
        assert len(gold) == len(words), (len(gold), len(words))
        fn = STEMMERS[lang]
        bad = [
            (w, fn(w), g)
            for w, g in zip(words, gold)
            if g != "<SKIP>" and fn(w) != g
        ]
        print(f"{lang}: {len(words)} words, {len(bad)} mismatches")
        for w, got, want in bad[:25]:
            print(f"  {w!r}: got {got!r} want {want!r}")
        total_bad += len(bad)
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
