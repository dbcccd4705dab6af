"""Named datetime-parser registry.

Mirrors the reference's analysis/datetime packages: `dateTimeOptional`
(RFC3339 variants, ref: datetime/optional/optional.go), `flexiblego`
(user layout lists, ref: datetime/flexible/flexible.go), `percentstyle`
(% format specifiers, ref: datetime/percent/percent.go),
`isostyle` (ISO-8601 specifiers, ref: datetime/iso/iso.go),
`sanitizedgo` (input cleanup + flexible, ref: datetime/sanitized),
and unix_{sec,milli,micro,nano} (ref: datetime/timestamp/*).

Parsers are driver-side: query endpoints (DateRangeQuery) resolve to
timestamps before planning, exactly where the reference calls
DateTimeParserNamed. Layouts are given in Go reference-time form
("2006-01-02 15:04:05") and converted to strptime formats.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Callable, Dict, List, Optional

ErrInvalidDateTime = ValueError

# Go reference-time tokens -> strptime, longest first (order matters)
_GO_TOKENS = [
    ("2006", "%Y"),
    ("January", "%B"),
    ("Jan", "%b"),
    ("Monday", "%A"),
    ("Mon", "%a"),
    ("15", "%H"),
    ("01", "%m"),
    ("02", "%d"),
    ("03", "%I"),
    ("04", "%M"),
    ("05", "%S"),
    ("06", "%y"),
    ("PM", "%p"),
    ("pm", "%p"),
    ("MST", "%Z"),
    ("Z07:00", "%z"),
    ("Z0700", "%z"),
    ("-07:00", "%z"),
    ("-0700", "%z"),
    ("-07", "%z"),
    ("1", "%m"),
    ("2", "%d"),
    ("3", "%I"),
    ("4", "%M"),
    ("5", "%S"),
]

_FRACTION = re.compile(r"\.([09]+)")


def go_layout_to_strptime(layout: str) -> List[str]:
    """Convert a Go layout to strptime format variants. A '.999...' or
    '.000...' fraction becomes an optional '.%f' — we emit variants with
    and without it (Go treats trailing 9-fractions as optional)."""
    frac = _FRACTION.search(layout)
    bases = [layout]
    if frac:
        with_f = layout[: frac.start()] + "\x00FRAC\x00" + layout[frac.end() :]
        without = layout[: frac.start()] + layout[frac.end() :]
        bases = [with_f, without]
    out = []
    for base in bases:
        fmt = base
        for go_tok, py_tok in _GO_TOKENS:
            fmt = fmt.replace(go_tok, py_tok)
        fmt = fmt.replace("\x00FRAC\x00", ".%f")
        out.append(fmt)
    return out


_TRUNC_FRACTION = re.compile(r"(\.\d{6})\d+")


def _strptime(value: str, fmt: str) -> datetime:
    # python %f caps at 6 digits; truncate nanosecond fractions
    return datetime.strptime(_TRUNC_FRACTION.sub(r"\1", value), fmt)


class FlexibleParser:
    """Try each layout in order (ref: flexible.go ParseDateTime)."""

    def __init__(self, layouts: List[str], go_layouts: bool = True):
        self.formats: List[str] = []
        for l in layouts:
            self.formats.extend(
                go_layout_to_strptime(l) if go_layouts else [l]
            )

    def parse(self, value: str) -> datetime:
        for fmt in self.formats:
            try:
                return _strptime(value, fmt)
            except ValueError:
                continue
        raise ErrInvalidDateTime(f"unable to parse datetime: {value!r}")


# ref: datetime/optional/optional.go layout list
_OPTIONAL_LAYOUTS = [
    "2006-01-02T15:04:05.999999999Z07:00",  # RFC3339Nano
    "2006-01-02T15:04:05Z07:00",  # RFC3339
    "2006-01-02T15:04:05",  # no timezone
    "2006-01-02 15:04:05",  # no timezone no T
    "2006-01-02 15:04:05 -0700",  # offset
    "2006-01-02",  # date only
]

# ref: datetime/percent/percent.go formatSpecifierToLayout
_PERCENT_MAP = {
    "%": "%%",
    "a": "%a",
    "A": "%A",
    "d": "%d",
    "e": "%d",
    "b": "%b",
    "B": "%B",
    "m": "%m",
    "o": "%m",
    "y": "%y",
    "Y": "%Y",
    "H": "%H",
    "I": "%I",
    "l": "%I",
    "p": "%p",
    "P": "%p",
    "M": "%M",
    "i": "%M",
    "S": "%S",
    "s": "%S",
    "f": "%f",
    "Z": "%Z",
    "z": "%z",
}


class PercentParser:
    """%-specifier layouts (ref: percent.go) — near-strptime already."""

    def __init__(self, layouts: List[str]):
        self.formats = []
        for layout in layouts:
            fmt = []
            i = 0
            while i < len(layout):
                if layout[i] == "%" and i + 1 < len(layout):
                    spec = layout[i + 1]
                    if spec not in _PERCENT_MAP:
                        raise ValueError(
                            f"invalid format specifier %{spec} in {layout!r}"
                        )
                    fmt.append(_PERCENT_MAP[spec])
                    i += 2
                else:
                    fmt.append(layout[i])
                    i += 1
            self.formats.append("".join(fmt))

    def parse(self, value: str) -> datetime:
        for fmt in self.formats:
            try:
                return _strptime(value, fmt)
            except ValueError:
                continue
        raise ErrInvalidDateTime(f"unable to parse datetime: {value!r}")


# ref: datetime/iso/iso.go format specifiers (subset: the ones whose
# strptime equivalents exist)
_ISO_MAP = {
    "yyyy": "%Y",
    "yy": "%y",
    "MMMM": "%B",
    "MMM": "%b",
    "MM": "%m",
    "M": "%m",
    "dd": "%d",
    "d": "%d",
    "EEEE": "%A",
    "EEE": "%a",
    "HH": "%H",
    "H": "%H",
    "hh": "%I",
    "h": "%I",
    "mm": "%M",
    "m": "%M",
    "ss": "%S",
    "s": "%S",
    "a": "%p",
    "SSSSSS": "%f",
    "SSSSS": "%f",
    "SSSS": "%f",
    "SSS": "%f",
    "SS": "%f",
    "S": "%f",
    "XXX": "%z",
    "XX": "%z",
    "X": "%z",
    "ZZZ": "%z",
    "ZZ": "%z",
    "Z": "%z",
    "zzz": "%Z",
    "zz": "%Z",
    "z": "%Z",
}


class ISOParser:
    """ISO-8601-style specifier layouts (ref: iso.go parseISOString):
    consecutive letter runs are specifiers; 'quoted' spans are
    literals ('' = literal quote)."""

    def __init__(self, layouts: List[str]):
        self.formats = [self._convert(l) for l in layouts]

    @staticmethod
    def _convert(layout: str) -> str:
        out = []
        i = 0
        n = len(layout)
        while i < n:
            c = layout[i]
            if c == "'":
                if i + 1 < n and layout[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                j = layout.find("'", i + 1)
                if j < 0:
                    raise ValueError(
                        f"unterminated text literal in {layout!r}"
                    )
                out.append(layout[i + 1 : j])
                i = j + 1
                continue
            if c.isalpha():
                run = 1
                while i + run < n and layout[i + run] == c:
                    run += 1
                spec = c * run
                # greedy: try the full run, then shorter prefixes
                while spec and spec not in _ISO_MAP:
                    spec = spec[:-1]
                if not spec:
                    raise ValueError(
                        f"unknown ISO specifier {c * run!r} in {layout!r}"
                    )
                out.append(_ISO_MAP[spec])
                i += len(spec)
                continue
            out.append(c)
            i += 1
        return "".join(out)

    def parse(self, value: str) -> datetime:
        for fmt in self.formats:
            try:
                return _strptime(value, fmt)
            except ValueError:
                continue
        raise ErrInvalidDateTime(f"unable to parse datetime: {value!r}")


_SANITIZE = str.maketrans(
    {
        " ": " ",  # nbsp
        " ": " ",
        " ": " ",
        "–": "-",  # en dash
        "—": "-",  # em dash
    }
)


class SanitizedParser(FlexibleParser):
    """Normalize exotic spaces/dashes then parse (ref: datetime/sanitized)."""

    def parse(self, value: str) -> datetime:
        return super().parse(value.translate(_SANITIZE).strip())


class UnixParser:
    """Integer epoch timestamps with per-unit bounds checks
    (ref: datetime/timestamp/*)."""

    def __init__(self, divisor: float):
        self.divisor = divisor
        # reference bounds: value * (1e9/divisor) must fit in int64
        # nanoseconds, i.e. |value| <= (2^63-1) * divisor / 1e9
        self.bound = (2**63 - 1) * divisor / 1e9

    def parse(self, value: str) -> datetime:
        try:
            raw = int(value)
        except ValueError:
            raise ErrInvalidDateTime(f"invalid unix timestamp: {value!r}")
        if abs(raw) > self.bound:
            raise ErrInvalidDateTime(f"unix timestamp out of range: {value!r}")
        try:
            return datetime.fromtimestamp(raw / self.divisor, tz=timezone.utc)
        except (OverflowError, OSError, ValueError):
            raise ErrInvalidDateTime(f"unix timestamp out of range: {value!r}")


# NOTE: single-digit specifiers map to the padded strptime directives
# (%d etc.) — strptime accepts unpadded values, and %-d is
# strftime-only.

DateTimeParser = Callable[[str], datetime]

_PARSERS: Dict[str, object] = {}


def register_datetime_parser(name: str, parser) -> None:
    _PARSERS[name] = parser


def datetime_parser_named(name: str):
    try:
        return _PARSERS[name]
    except KeyError:
        raise KeyError(
            f"no datetime parser named {name!r}; "
            f"registered: {sorted(_PARSERS)}"
        ) from None


register_datetime_parser("dateTimeOptional", FlexibleParser(_OPTIONAL_LAYOUTS))
register_datetime_parser("sanitizedgo", SanitizedParser(_OPTIONAL_LAYOUTS))
register_datetime_parser("unix_sec", UnixParser(1))
register_datetime_parser("unix_milli", UnixParser(1e3))
register_datetime_parser("unix_micro", UnixParser(1e6))
register_datetime_parser("unix_nano", UnixParser(1e9))
