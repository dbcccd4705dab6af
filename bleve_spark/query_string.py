"""Query-string mini parser.

Hand-rolled port of the grammar the reference implements with goyacc
(/root/reference/search/query/query_string.y:55-291): clauses are
whitespace-separated, `+` prefix = must, `-` prefix = must_not, otherwise
should; a clause is [field:]body where body is a quoted phrase, /regex/,
wildcard (*?), numeric comparison (>n >=n <n <=n, negative numbers
allowed), quoted-endpoint date comparison (>"2006-01-02", .y:246-291),
or a match string; `~N` fuzziness (slop on phrases) and `^boost`
suffixes apply to quoted bodies too; backslash escapes the next
character like the reference lexer (query_string_lex.go).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from . import query as Q

# a body is a quoted phrase or /regex/ (with escapes) plus any trailing
# suffix chars (~N ^N), or a bare word where backslash escapes the next
# char (so `foo\ bar` and `foo\:bar` stay one clause)
_CLAUSE = re.compile(
    r"""\s*
    (?P<prefix>[+-]?)
    (?:(?P<field>"(?:[^"\\]|\\.)*"|[\w.]+):)?
    (?P<body>(?:"(?:[^"\\]|\\.)*"|/(?:[^/\\]|\\.)*/)\S*|(?:[^\s\\]|\\.)+)
    """,
    re.VERBOSE,
)

_QUOTED = re.compile(r'"(?:[^"\\]|\\.)*"')
_REGEX = re.compile(r"/(?:[^/\\]|\\.)*/")


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _parse_suffixes(body: str) -> Tuple[str, Optional[int], float]:
    """Strip trailing ^boost and ~N (either order) off `body`."""
    boost = 1.0
    fuzz = None
    for _ in range(2):
        m = re.search(r"\^(\d+(?:\.\d+)?)?$", body)
        if m and m.end() > m.start() and boost == 1.0:
            boost = float(m.group(1)) if m.group(1) else 1.0
            body = body[: m.start()]
            continue
        m = re.search(r"~(\d+)?$", body)
        if m and fuzz is None:
            fuzz = int(m.group(1) or 1)
            body = body[: m.start()]
    return body, fuzz, boost


def _range_query(
    field: Optional[str], op: str, endpoint: str, boost: float
) -> Q.Query:
    """>n / >=n / <n / <=n with numeric or quoted (date) endpoint
    (ref: query_string.y:208-291)."""
    inclusive = op.endswith("=")
    is_min = op.startswith(">")
    if endpoint.startswith('"') and endpoint.endswith('"'):
        value = _unescape(endpoint[1:-1])
        if is_min:
            return Q.DateRangeQuery(
                boost, field, start=value, inclusive_start=inclusive
            )
        return Q.DateRangeQuery(
            boost, field, end=value, inclusive_end=inclusive
        )
    num = float(endpoint)
    if is_min:
        return Q.NumericRangeQuery(
            boost, field, min=num, inclusive_min=inclusive
        )
    return Q.NumericRangeQuery(boost, field, max=num, inclusive_max=inclusive)


def _clause_query(field: Optional[str], body: str) -> Optional[Q.Query]:
    # quoted phrase / regex cores keep their suffixes OUTSIDE the quotes
    m = _QUOTED.match(body)
    if m:
        _, fuzz, boost = _parse_suffixes(body[m.end() :] or "")
        text = _unescape(m.group(0)[1:-1])
        if not text.strip():
            return None
        return Q.MatchPhraseQuery(boost, field, text=text, slop=fuzz or 0)
    m = _REGEX.match(body)
    if m:
        _, _fuzz, boost = _parse_suffixes(body[m.end() :] or "")
        return Q.RegexpQuery(boost, field, regexp=_unescape(m.group(0)[1:-1]))
    body, fuzz, boost = _parse_suffixes(body)
    if not body:
        return None
    for op in (">=", ">", "<=", "<"):
        if body.startswith(op):
            return _range_query(field, op, body[len(op) :], boost)
    if "*" in body or "?" in body:
        return Q.WildcardQuery(boost, field, wildcard=_unescape(body))
    text = _unescape(body)
    if fuzz is not None:
        return Q.MatchQuery(boost, field, text=text, fuzziness=fuzz)
    try:
        # a bare number matches as text OR as an exact numeric value
        # (ref: query_string.y:178-206 disjunction of match + inclusive
        # numeric range; the test golden at parser_test "33")
        num = float(text)
    except ValueError:
        return Q.MatchQuery(boost, field, text=text)
    return Q.DisjunctionQuery(
        boost,
        None,
        disjuncts=[
            Q.MatchQuery(1.0, field, text=text),
            Q.NumericRangeQuery(
                1.0,
                field,
                min=num,
                max=num,
                inclusive_min=True,
                inclusive_max=True,
            ),
        ],
        min=1,
    )


def parse_query_string(s: str) -> Q.Query:
    must: List[Q.Query] = []
    should: List[Q.Query] = []
    must_not: List[Q.Query] = []
    for m in _CLAUSE.finditer(s):
        fld = m.group("field")
        if fld and fld.startswith('"'):
            fld = _unescape(fld[1:-1])  # quoted field names ("fie ld":x)
        q = _clause_query(fld, m.group("body"))
        if q is None:
            continue
        prefix = m.group("prefix")
        if prefix == "+":
            must.append(q)
        elif prefix == "-":
            must_not.append(q)
        else:
            should.append(q)
    if not must and not must_not and len(should) == 1:
        return should[0]
    return Q.BooleanQuery(must=must, should=should, must_not=must_not)
