"""Query-string mini parser.

Hand-rolled port of the grammar the reference implements with goyacc
(/root/reference/search/query/query_string.y:55-280): clauses are
whitespace-separated, `+` prefix = must, `-` prefix = must_not, otherwise
should; a clause is [field:]body where body is a quoted phrase, /regex/,
wildcard (*?), numeric comparison (>n >=n <n <=n), or a match string;
`~N` fuzziness and `^boost` suffixes.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from . import query as Q

_CLAUSE = re.compile(
    r"""\s*
    (?P<prefix>[+-]?)
    (?:(?P<field>[\w.]+):)?
    (?P<body>"[^"]*"|/[^/]*/|\S+)
    """,
    re.VERBOSE,
)


def _parse_suffixes(body: str) -> Tuple[str, Optional[int], float]:
    boost = 1.0
    fuzz = None
    m = re.search(r"\^(\d+(?:\.\d+)?)$", body)
    if m:
        boost = float(m.group(1))
        body = body[: m.start()]
    m = re.search(r"~(\d+)?$", body)
    if m:
        fuzz = int(m.group(1) or 1)
        body = body[: m.start()]
    return body, fuzz, boost


def _clause_query(field: Optional[str], body: str) -> Q.Query:
    body, fuzz, boost = _parse_suffixes(body)
    if body.startswith('"') and body.endswith('"') and len(body) >= 2:
        return Q.MatchPhraseQuery(boost, field, text=body[1:-1], slop=fuzz or 0)
    if body.startswith("/") and body.endswith("/") and len(body) >= 2:
        return Q.RegexpQuery(boost, field, regexp=body[1:-1])
    for op, kw in ((">=", "inclusive_min"), (">", None)):
        if body.startswith(op):
            return Q.NumericRangeQuery(
                boost, field, min=float(body[len(op):]),
                inclusive_min=(op == ">="),
            )
    for op in ("<=", "<"):
        if body.startswith(op):
            return Q.NumericRangeQuery(
                boost, field, max=float(body[len(op):]),
                inclusive_max=(op == "<="),
            )
    if "*" in body or "?" in body:
        return Q.WildcardQuery(boost, field, wildcard=body)
    if fuzz is not None:
        return Q.MatchQuery(boost, field, text=body, fuzziness=fuzz)
    return Q.MatchQuery(boost, field, text=body)


def parse_query_string(s: str) -> Q.Query:
    must: List[Q.Query] = []
    should: List[Q.Query] = []
    must_not: List[Q.Query] = []
    for m in _CLAUSE.finditer(s):
        q = _clause_query(m.group("field"), m.group("body"))
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
