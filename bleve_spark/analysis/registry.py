"""Named-component registry + custom-analyzer construction.

Mirrors the reference's registry surface (ref: registry/*.go,
mapping/index.go:60-147 AddCustomCharFilter/Tokenizer/TokenFilter/
Analyzer, analysis/analyzer/custom/custom.go): components are looked
up by the reference's names, config-parameterized ones are factories
taking a config dict, and `add_custom_analyzer(name, config)` builds
and registers a chain from named parts:

    add_custom_analyzer("code_shingles", {
        "char_filters": ["html"],
        "tokenizer": "unicode",
        "token_filters": ["camelCase", "to_lower",
                          {"type": "shingle", "min": 2, "max": 2}],
    })

Entries in char_filters/token_filters are either a registered name or
an inline {"type": <factory name>, ...config} dict (the analogue of
AddCustomTokenFilter followed by use-by-name).
"""

from __future__ import annotations

from typing import Callable, Dict

from . import (
    asciifolding_char_filter,
    html_char_filter,
    make_regexp_char_filter,
    zero_width_char_filter,
)
from .filters import (
    apostrophe_filter,
    camelcase_filter,
    cjk_width_filter,
    lowercase_filter,
    make_cjk_bigram_filter,
    make_dict_compound_filter,
    make_edge_ngram_filter,
    make_elision_filter,
    make_hierarchy_filter,
    make_keyword_marker_filter,
    make_length_filter,
    make_ngram_filter,
    make_shingle_filter,
    make_stop_filter,
    make_truncate_filter,
    make_unicodenorm_filter,
    porter_filter,
    reverse_filter,
    stop_en_filter,
    unique_filter,
)
from .tokenizers import (
    letter_tokenize,
    make_regexp_tokenizer,
    single_tokenize,
    unicode_tokenize,
    web_tokenize,
    whitespace_tokenize,
)

# -- tokenizers (ref names: registry.RegisterTokenizer call sites) ----------

TOKENIZERS: Dict[str, Callable] = {
    "unicode": unicode_tokenize,
    "letter": letter_tokenize,
    "whitespace": whitespace_tokenize,
    "single": single_tokenize,
    "web": web_tokenize,
}

TOKENIZER_FACTORIES: Dict[str, Callable] = {
    "regexp": lambda cfg: make_regexp_tokenizer(cfg["regexp"]),
    # the reference's `character` tokenizer is a rune-class predicate;
    # a character-class regexp expresses the same runs
    "character": lambda cfg: make_regexp_tokenizer(cfg["regexp"]),
}

# -- char filters -----------------------------------------------------------

CHAR_FILTERS: Dict[str, Callable] = {
    "html": html_char_filter,
    "zero_width_spaces": zero_width_char_filter,
    "asciifolding": asciifolding_char_filter,
}

CHAR_FILTER_FACTORIES: Dict[str, Callable] = {
    "regexp": lambda cfg: make_regexp_char_filter(
        cfg["regexp"], cfg.get("replace", " ")
    ),
}

# -- token filters ----------------------------------------------------------


def _lang_stop(lang: str):
    from .lang_extra import stop_filter

    return stop_filter(lang)


TOKEN_FILTERS: Dict[str, Callable] = {
    "to_lower": lowercase_filter,
    "stop_en": stop_en_filter,
    "stemmer_porter": porter_filter,
    "camelCase": camelcase_filter,
    "apostrophe": apostrophe_filter,
    "reverse": reverse_filter,
    "unique": unique_filter,
    "cjk_width": cjk_width_filter,
    "possessive_en": None,  # resolved lazily below (import cycle)
    "stemmer_en_plural": None,
}

TOKEN_FILTER_FACTORIES: Dict[str, Callable] = {
    "stop_tokens": lambda cfg: make_stop_filter(cfg["stop_words"]),
    "edge_ngram": lambda cfg: make_edge_ngram_filter(
        cfg.get("min", 1), cfg.get("max", 2), cfg.get("back", False)
    ),
    "ngram": lambda cfg: make_ngram_filter(cfg.get("min", 1), cfg.get("max", 2)),
    "shingle": lambda cfg: make_shingle_filter(
        cfg.get("min", 2),
        cfg.get("max", 2),
        sep=cfg.get("separator", " "),
        output_original=cfg.get("output_original", False),
    ),
    "length": lambda cfg: make_length_filter(
        cfg.get("min", 1), cfg.get("max", 0)
    ),
    "truncate_token": lambda cfg: make_truncate_filter(cfg["length"]),
    "unicodenorm": lambda cfg: make_unicodenorm_filter(
        cfg.get("form", "NFKC").upper()
    ),
    "keyword_marker": lambda cfg: make_keyword_marker_filter(
        cfg["keywords"]
    ),
    "elision": lambda cfg: make_elision_filter(cfg["articles"]),
    "hierarchy": lambda cfg: make_hierarchy_filter(
        cfg.get("delimiter", "/")
    ),
    "dict_compound": lambda cfg: make_dict_compound_filter(
        cfg["dict_tokens"],
        cfg.get("min_subword_size", 3),
        cfg.get("max_subword_size", 15),
        cfg.get("only_longest_match", False),
    ),
    "cjk_bigram": lambda cfg: make_cjk_bigram_filter(
        cfg.get("output_unigram", False)
    ),
    # per-language stop filters by the reference's names (stop_fr etc.)
    **{
        f"stop_{lang}": (lambda l: (lambda cfg: _lang_stop(l)))(lang)
        for lang in (
            "ar bg ca cs ckb da de el es eu fa fi fr ga gl hi hr hu hy "
            "id it nl no pt ro ru sv tr"
        ).split()
    },
}


def _resolve_lazy():
    if TOKEN_FILTERS["possessive_en"] is None:
        from .lang_extra import english_plural_stem_filter, possessive_filter_en

        TOKEN_FILTERS["possessive_en"] = possessive_filter_en
        TOKEN_FILTERS["stemmer_en_plural"] = english_plural_stem_filter
        _register_reference_lang_filters()


def _register_reference_lang_filters():
    """Every per-language token filter under the reference's registry
    names, so custom-analyzer configs written against the reference
    resolve verbatim (ref: the RegisterTokenFilter calls across
    analysis/lang/*/ and analysis/token/snowball). Loaded lazily with
    the other lang components (import cycle + startup cost)."""
    from . import lang as L
    from . import lang_extra as LX
    from . import lang_hr as LHR
    from . import snowball as SB
    from . import snowball_ext as SBX
    from . import snowball_variants as SBV
    from .filters import porter_filter
    from .porter2 import porter2_filter

    TOKEN_FILTERS.update(
        {
            # light/minimal/normalize chain parts
            # (ref: lang/{de,fr,es,it,pt}/light_stemmer_*.go,
            #  lang/fr/minimal_stemmer_fr.go, lang/de/german_normalize.go)
            "stemmer_de_light": L.german_light_stem_filter,
            "stemmer_fr_light": L.french_light_stem_filter,
            "stemmer_es_light": L.spanish_light_stem_filter,
            "stemmer_it_light": L.italian_light_stem_filter,
            "stemmer_pt_light": L.portuguese_light_stem_filter,
            "stemmer_fr_min": SBV.minimal_fr_filter,
            "normalize_de": L.german_normalize_filter,
            # elisions (ref: lang/{fr,it,ca,ga}/elision_*.go)
            "elision_fr": L.elision_fr_filter,
            "elision_it": L.elision_it_filter,
            "elision_ca": LX.elision_ca_filter,
            "elision_ga": LX.elision_ga_filter,
            # full snowball stemmers
            # (ref: lang/*/stemmer_*_snowball.go)
            "stemmer_fr_snowball": SBV.snowball_fr_filter,
            "stemmer_de_snowball": SBV.snowball_de_filter,
            "stemmer_es_snowball": SBV.snowball_es_filter,
            "stemmer_it_snowball": SBV.snowball_it_filter,
            "stemmer_en_snowball": porter2_filter,
            "stemmer_da_snowball": SB.snowball_da_filter,
            "stemmer_no_snowball": SB.snowball_no_filter,
            "stemmer_sv_snowball": SB.snowball_sv_filter,
            "stemmer_ru_snowball": SB.snowball_ru_filter,
            "stemmer_nl_snowball": SB.snowball_nl_filter,
            "stemmer_fi_snowball": SBX.snowball_fi_filter,
            "stemmer_hu_snowball": SBX.snowball_hu_filter,
            "stemmer_ro_snowball": SBX.snowball_ro_filter,
            "stemmer_tr_snowball": SBX.snowball_tr_filter,
            # non-snowball language stemmers / normalizers
            # (ref: lang/{ar,ckb,hi,hr,fa,in}/*.go)
            "stemmer_ar": LX.arabic_stem_filter,
            "stemmer_ckb": LX.sorani_stem_filter,
            "stemmer_hi": LX.hindi_stem_filter,
            "stemmer_hr": LHR.croatian_stem_filter,
            "hr_suffix_transformation_filter": LHR.croatian_suffix_filter,
            "normalize_ar": LX.arabic_normalize_filter,
            "normalize_ckb": LX.sorani_normalize_filter,
            "normalize_fa": LX.persian_normalize_filter,
            "normalize_hi": LX.hindi_normalize_filter,
            "normalize_in": LX.indic_normalize_filter,
        }
    )
    # configurable snowball (ref: analysis/token/snowball/snowball.go —
    # config {"language": ...}; "english"/"porter" per the Go snowball
    # package's language names)
    by_language = {
        "english": porter2_filter,
        "porter": porter_filter,
        "french": SBV.snowball_fr_filter,
        "german": SBV.snowball_de_filter,
        "spanish": SBV.snowball_es_filter,
        "italian": SBV.snowball_it_filter,
        "danish": SB.snowball_da_filter,
        "norwegian": SB.snowball_no_filter,
        "swedish": SB.snowball_sv_filter,
        "russian": SB.snowball_ru_filter,
        "dutch": SB.snowball_nl_filter,
        "finnish": SBX.snowball_fi_filter,
        "hungarian": SBX.snowball_hu_filter,
        "romanian": SBX.snowball_ro_filter,
        "turkish": SBX.snowball_tr_filter,
    }

    def _snowball_factory(cfg):
        lang = cfg.get("language")
        if not lang:
            raise ValueError("must specify language")
        if lang not in by_language:
            raise KeyError(
                f"no snowball language {lang!r}; known: "
                f"{sorted(by_language)}"
            )
        return by_language[lang]

    TOKEN_FILTER_FACTORIES["stemmer_snowball"] = _snowball_factory


def _component(entry, named: dict, factories: dict, kind: str):
    _resolve_lazy()
    if isinstance(entry, str):
        if entry in named and named[entry] is not None:
            return named[entry]
        if entry in factories:
            return factories[entry]({})
        raise KeyError(
            f"no {kind} named {entry!r}; known: "
            f"{sorted(set(named) | set(factories))}"
        )
    if isinstance(entry, dict):
        typ = entry.get("type")
        if typ not in factories:
            raise KeyError(f"no {kind} factory named {typ!r}")
        return factories[typ](entry)
    raise TypeError(f"{kind} entry must be a name or a config dict")


def build_custom_analyzer(name: str, config: dict):
    """Construct (but do not register) an Analyzer from named parts
    (ref: analyzer/custom/custom.go AnalyzerConstructor)."""
    from . import Analyzer

    tok_entry = config.get("tokenizer")
    if tok_entry is None:
        raise ValueError("must specify tokenizer")
    tokenizer = _component(
        tok_entry, TOKENIZERS, TOKENIZER_FACTORIES, "tokenizer"
    )
    char_filters = [
        _component(e, CHAR_FILTERS, CHAR_FILTER_FACTORIES, "char filter")
        for e in config.get("char_filters", [])
    ]
    token_filters = [
        _component(e, TOKEN_FILTERS, TOKEN_FILTER_FACTORIES, "token filter")
        for e in config.get("token_filters", [])
    ]
    return Analyzer(
        name, tokenizer, char_filters=char_filters, token_filters=token_filters
    )


def add_custom_analyzer(name: str, config: dict):
    """Build + register, the AddCustomAnalyzer analogue
    (ref: mapping/index.go:100-147)."""
    from . import register_analyzer

    return register_analyzer(build_custom_analyzer(name, config))
