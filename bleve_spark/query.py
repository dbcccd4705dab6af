"""Query AST.

Dataclass mirrors of the reference's query types
(/root/reference/search/query/*.go) plus ``parse_query``, the analogue of
the polymorphic JSON dispatch in ParseQuery
(/root/reference/search/query/query.go:69-180): presence of keys decides
the type (match/match_phrase/term/prefix/regexp/wildcard/fuzzy/ranges/
bool/conjuncts/disjuncts/ids/match_all/match_none/query-string).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


@dataclass
class Query:
    boost: float = 1.0
    field: Optional[str] = None


@dataclass
class TermQuery(Query):  # ref: query/term.go:26-38
    term: str = ""


@dataclass
class MatchQuery(Query):  # ref: query/match.go:27-60
    text: str = ""
    operator: str = "or"  # "or" (min=1 disjunction) | "and" (conjunction)
    analyzer: Optional[str] = None
    fuzziness: int = 0
    prefix_length: int = 0


@dataclass
class MatchPhraseQuery(Query):  # ref: query/match_phrase.go:27-33
    text: str = ""
    analyzer: Optional[str] = None
    slop: int = 0


@dataclass
class PhraseQuery(Query):  # ref: query/phrase.go:28-33
    terms: Sequence[str] = ()
    slop: int = 0


@dataclass
class PrefixQuery(Query):  # ref: query/prefix.go:26-38
    prefix: str = ""


@dataclass
class WildcardQuery(Query):  # ref: query/wildcard.go:46-58
    wildcard: str = ""


@dataclass
class RegexpQuery(Query):  # ref: query/regexp.go:27-39
    regexp: str = ""


@dataclass
class FuzzyQuery(Query):  # ref: query/fuzzy.go:26-32
    term: str = ""
    fuzziness: int = 1
    prefix_length: int = 0


@dataclass
class TermRangeQuery(Query):  # ref: query/term_range.go:27-34
    min: Optional[str] = None
    max: Optional[str] = None
    inclusive_min: bool = True
    inclusive_max: bool = False


@dataclass
class NumericRangeQuery(Query):  # ref: query/numeric_range.go:27-34
    min: Optional[float] = None
    max: Optional[float] = None
    inclusive_min: bool = True
    inclusive_max: bool = False


@dataclass
class DateRangeQuery(Query):  # ref: query/date_range.go:87-94
    start: Optional[str] = None
    end: Optional[str] = None
    inclusive_start: bool = True
    inclusive_end: bool = False
    # named parser for string endpoints (ref: query/date_range_string.go
    # DateTimeParser option); None = the default "dateTimeOptional"
    datetime_parser: Optional[str] = None


@dataclass
class BoolFieldQuery(Query):  # ref: query/bool_field.go:26-37
    value: bool = True


@dataclass
class DocIDQuery(Query):  # ref: query/docid.go:26-38
    ids: Sequence[str] = ()


@dataclass
class MatchAllQuery(Query):  # ref: query/match_all.go:27-35
    pass


@dataclass
class MatchNoneQuery(Query):  # ref: query/match_none.go
    pass


@dataclass
class IPRangeQuery(Query):  # ref: query/ip_range.go:28-33
    cidr: str = ""


@dataclass
class FilterQuery(Query):
    """Wrap any query with a post-filter predicate over the stored doc
    columns — the FilteringSearcher analogue (ref: searcher/
    search_filter.go:36-50 FilterFunc/NewFilteringSearcher). The
    predicate is a Spark SQL expression string (the declarative
    equivalent of the reference's accept callback)."""

    child: Optional["Query"] = None
    predicate: str = "true"


# --- FilterQuery predicate validation (untrusted surfaces) -----------------
#
# FilterQuery.predicate is evaluated with F.expr() at search time
# (search.py). From the Python API that is fine — the caller already holds
# the driver. From the HTTP API it is an arbitrary-Spark-SQL surface
# (java_method()/reflect() reach arbitrary JVM statics), which the
# reference's HTTP handlers never expose. Untrusted entry points call
# validate_filter_predicate() first, restricting the expression to plain
# column comparisons: literals, (backticked/dotted) column refs,
# comparison operators, AND/OR/NOT/IN/BETWEEN/IS/NULL/LIKE, parentheses.
# Function-call syntax of any kind is rejected.

_FILTER_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^'\\]|\\.|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<bq>`[^`]+`)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
      | (?P<op><=|>=|<>|!=|==|=|<|>|\(|\)|,)
    )""",
    re.VERBOSE,
)

_FILTER_KEYWORDS = frozenset(
    {"and", "or", "not", "in", "between", "is", "null",
     "like", "rlike", "true", "false"}
)

# SQL constructs that are never a plain column comparison — rejected
# outright even without call syntax (subqueries, casts, case exprs,
# window clauses, lambdas, interval literals)
_FILTER_REJECT = frozenset(
    {"select", "from", "where", "union", "join", "cast", "try_cast",
     "case", "when", "then", "else", "end", "exists", "over", "window",
     "lateral", "distinct", "interval", "struct", "map", "array",
     "values", "insert", "update", "delete", "drop", "create", "alter"}
)


class UnsafeFilterPredicateError(ValueError):
    pass


def validate_filter_predicate(pred: str) -> None:
    """Raise UnsafeFilterPredicateError unless ``pred`` is a plain
    column-comparison boolean expression (no function calls, no
    subqueries, no casts). Used by untrusted surfaces (HTTP API) before
    a FilterQuery predicate reaches F.expr()."""
    pos, n = 0, len(pred)
    toks = []  # (kind, text)
    while pos < n:
        m = _FILTER_TOKEN.match(pred, pos)
        if m is None or m.end() == pos:
            rest = pred[pos:].strip()
            if not rest:
                break
            raise UnsafeFilterPredicateError(
                f"filter predicate: unsupported syntax at {rest[:20]!r}"
            )
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))
        pos = m.end()
    for i, (kind, text) in enumerate(toks):
        if kind not in ("ident", "bq"):
            continue
        # backtick-quoted names are identifiers too — they must get the
        # same treatment, or `java_method`(...) slips through
        low = (text[1:-1] if kind == "bq" else text).lower()
        if kind == "ident" and low in _FILTER_KEYWORDS:
            continue
        if low in _FILTER_REJECT or any(
            part in _FILTER_REJECT for part in low.split(".")
        ):
            raise UnsafeFilterPredicateError(
                f"filter predicate: {text!r} is not allowed"
            )
        # identifier = column reference; reject call syntax
        if i + 1 < len(toks) and toks[i + 1][1] == "(":
            raise UnsafeFilterPredicateError(
                f"filter predicate: function calls are not allowed "
                f"({text!r})"
            )


def validate_query_filters(q: "Query") -> None:
    """Walk a parsed query tree and validate every FilterQuery
    predicate (see validate_filter_predicate)."""
    if isinstance(q, FilterQuery):
        validate_filter_predicate(q.predicate)
    for attr in ("child", "must", "should", "must_not", "conjuncts",
                 "disjuncts"):
        v = getattr(q, attr, None)
        if isinstance(v, Query):
            validate_query_filters(v)
        elif isinstance(v, (list, tuple)):
            for c in v:
                if isinstance(c, Query):
                    validate_query_filters(c)


@dataclass
class GeoShapeQuery(Query):
    """ref: query/geo_shape.go + searcher/search_geoshape.go: a GeoJSON
    (+envelope/circle) query geometry and a relation
    (intersects | contains | within)."""

    shape: Optional[dict] = None
    relation: str = "intersects"


@dataclass
class GeoDistanceQuery(Query):  # ref: query/geo_distance.go
    location: object = None  # [lon,lat] | {"lon","lat"} | "lat, lon" | geohash
    distance: str = "1km"


@dataclass
class GeoBoundingBoxQuery(Query):  # ref: query/geo_boundingbox.go
    top_left: object = None
    bottom_right: object = None


@dataclass
class GeoPolygonQuery(Query):  # ref: query/geo_boundingpolygon.go
    polygon_points: Sequence = ()


@dataclass
class ConjunctionQuery(Query):  # ref: query/conjunction.go:28-40
    conjuncts: List[Query] = field(default_factory=list)


@dataclass
class DisjunctionQuery(Query):  # ref: query/disjunction.go:29-41
    disjuncts: List[Query] = field(default_factory=list)
    min: int = 0  # 0/1 -> at least one


@dataclass
class BooleanQuery(Query):  # ref: query/boolean.go:29-35
    must: List[Query] = field(default_factory=list)
    should: List[Query] = field(default_factory=list)
    must_not: List[Query] = field(default_factory=list)
    min_should: int = 0


def parse_query(d: dict) -> Query:
    """JSON dict -> Query (ref: query/query.go:69-180 key dispatch)."""
    boost = float(d.get("boost", 1.0))
    fld = d.get("field")

    def sub(lst):
        return [parse_query(x) for x in lst]

    if "match" in d:
        return MatchQuery(
            boost,
            fld,
            text=d["match"],
            operator=d.get("operator", "or"),
            analyzer=d.get("analyzer"),
            fuzziness=int(d.get("fuzziness", 0)),
            prefix_length=int(d.get("prefix_length", 0)),
        )
    if "match_phrase" in d:
        return MatchPhraseQuery(
            boost, fld, text=d["match_phrase"], analyzer=d.get("analyzer"),
            slop=int(d.get("slop", 0)),
        )
    if "term" in d:
        # fuzziness turns a term query fuzzy — checked before the plain
        # term branch, matching the reference's dispatch
        # (ref: query/query.go ParseQuery hasFuzziness-before-term)
        if "fuzziness" in d:
            return FuzzyQuery(
                boost, fld, term=d["term"], fuzziness=int(d["fuzziness"]),
                prefix_length=int(d.get("prefix_length", 0)),
            )
        return TermQuery(boost, fld, term=d["term"])
    if "terms" in d:
        return PhraseQuery(boost, fld, terms=d["terms"], slop=int(d.get("slop", 0)))
    if "prefix" in d:
        return PrefixQuery(boost, fld, prefix=d["prefix"])
    if "regexp" in d:
        return RegexpQuery(boost, fld, regexp=d["regexp"])
    if "wildcard" in d:
        return WildcardQuery(boost, fld, wildcard=d["wildcard"])
    if "fuzziness" in d and "term" in d:
        return FuzzyQuery(
            boost, fld, term=d["term"], fuzziness=int(d["fuzziness"]),
            prefix_length=int(d.get("prefix_length", 0)),
        )
    if "must" in d or "should" in d or "must_not" in d:
        def clauses(x):
            if x is None:
                return []
            if isinstance(x, dict) and "conjuncts" in x:
                return sub(x["conjuncts"])
            if isinstance(x, dict) and "disjuncts" in x:
                return sub(x["disjuncts"])
            if isinstance(x, list):
                return sub(x)
            return [parse_query(x)]

        return BooleanQuery(
            boost, fld,
            must=clauses(d.get("must")),
            should=clauses(d.get("should")),
            must_not=clauses(d.get("must_not")),
            min_should=int(d.get("should", {}).get("min", 0))
            if isinstance(d.get("should"), dict)
            else 0,
        )
    if "conjuncts" in d:
        return ConjunctionQuery(boost, fld, conjuncts=sub(d["conjuncts"]))
    if "disjuncts" in d:
        return DisjunctionQuery(
            boost, fld, disjuncts=sub(d["disjuncts"]), min=int(d.get("min", 0))
        )
    if "filter" in d and "query" in d:
        return FilterQuery(
            boost,
            fld,
            child=parse_query(d["query"]),
            predicate=str(d["filter"]),
        )
    if "ids" in d:
        return DocIDQuery(boost, fld, ids=d["ids"])
    if "cidr" in d:
        return IPRangeQuery(boost, fld, cidr=d["cidr"])
    if "geometry" in d:
        g = d["geometry"]
        return GeoShapeQuery(
            boost,
            fld,
            shape=g.get("shape"),
            relation=g.get("relation", "intersects"),
        )
    if "location" in d and "distance" in d:
        return GeoDistanceQuery(
            boost, fld, location=d["location"], distance=d["distance"]
        )
    if "top_left" in d and "bottom_right" in d:
        return GeoBoundingBoxQuery(
            boost, fld, top_left=d["top_left"],
            bottom_right=d["bottom_right"],
        )
    if "polygon_points" in d:
        return GeoPolygonQuery(boost, fld, polygon_points=d["polygon_points"])
    if "min" in d or "max" in d:
        mn, mx = d.get("min"), d.get("max")
        if isinstance(mn, str) or isinstance(mx, str):
            return TermRangeQuery(
                boost, fld, min=mn, max=mx,
                inclusive_min=bool(d.get("inclusive_min", True)),
                inclusive_max=bool(d.get("inclusive_max", False)),
            )
        return NumericRangeQuery(
            boost, fld, min=mn, max=mx,
            inclusive_min=bool(d.get("inclusive_min", True)),
            inclusive_max=bool(d.get("inclusive_max", False)),
        )
    if "start" in d or "end" in d:
        return DateRangeQuery(
            boost, fld, start=d.get("start"), end=d.get("end"),
            inclusive_start=bool(d.get("inclusive_start", True)),
            inclusive_end=bool(d.get("inclusive_end", False)),
            datetime_parser=d.get("datetime_parser"),
        )
    if "bool" in d:
        return BoolFieldQuery(boost, fld, value=bool(d["bool"]))
    if "match_all" in d:
        return MatchAllQuery(boost, fld)
    if "match_none" in d:
        return MatchNoneQuery(boost, fld)
    if "query" in d:
        from .query_string import parse_query_string

        return parse_query_string(d["query"])
    raise ValueError(f"unknown query shape: {sorted(d)}")
