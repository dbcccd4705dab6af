"""Datetime parser registry (ref: analysis/datetime/*): behavior-level
vectors per named parser, plus DateRangeQuery endpoint resolution."""

from datetime import datetime, timezone

import pytest

from bleve_spark.analysis.datetimes import (
    FlexibleParser,
    ISOParser,
    PercentParser,
    SanitizedParser,
    datetime_parser_named,
)


def test_optional_rfc3339_variants():
    # layouts per ref datetime/optional/optional.go
    p = datetime_parser_named("dateTimeOptional")
    assert p.parse("2006-01-02T15:04:05Z") == datetime(
        2006, 1, 2, 15, 4, 5, tzinfo=timezone.utc
    )
    assert p.parse("2006-01-02T15:04:05.123456789Z").microsecond == 123456
    assert p.parse("2006-01-02 15:04:05") == datetime(2006, 1, 2, 15, 4, 5)
    assert p.parse("2006-01-02") == datetime(2006, 1, 2)
    off = p.parse("2006-01-02T15:04:05+07:00")
    assert off.utcoffset().total_seconds() == 7 * 3600
    with pytest.raises(ValueError):
        p.parse("not a date")


def test_flexible_go_layouts():
    p = FlexibleParser(["02/01/2006", "Jan 2, 2006 3:04 PM"])
    assert p.parse("30/11/2021") == datetime(2021, 11, 30)
    assert p.parse("Jan 2, 2006 3:04 PM") == datetime(2006, 1, 2, 15, 4)
    with pytest.raises(ValueError):
        p.parse("2021-11-30")


def test_percent_style():
    p = PercentParser(["%Y/%m/%d %H:%M", "%B %e, %Y"])
    assert p.parse("2024/01/03 12:30") == datetime(2024, 1, 3, 12, 30)
    assert p.parse("January 2, 2006") == datetime(2006, 1, 2)
    with pytest.raises(ValueError):
        PercentParser(["%Y-%T"])  # unknown specifier, like the reference


def test_iso_style():
    p = ISOParser(["yyyy-MM-dd'T'HH:mm:ss", "MMM d yyyy"])
    assert p.parse("2024-01-03T12:30:45") == datetime(2024, 1, 3, 12, 30, 45)
    assert p.parse("Jan 3 2024") == datetime(2024, 1, 3)
    with pytest.raises(ValueError):
        ISOParser(["yyyy-QQ"])  # unknown specifier


def test_sanitized():
    p = SanitizedParser(["2006-01-02 15:04:05"])
    # non-breaking space + en dash input
    assert p.parse("2006‑01‑02 15:04:05".replace("‑", "-")) == datetime(
        2006, 1, 2, 15, 4, 5
    )
    assert p.parse("2006–01–02 15:04:05") == datetime(2006, 1, 2, 15, 4, 5)


def test_unix_parsers():
    t = datetime(2024, 1, 1, tzinfo=timezone.utc)
    epoch = int(t.timestamp())
    assert datetime_parser_named("unix_sec").parse(str(epoch)) == t
    assert datetime_parser_named("unix_milli").parse(str(epoch * 1000)) == t
    assert datetime_parser_named("unix_micro").parse(str(epoch * 10**6)) == t
    assert datetime_parser_named("unix_nano").parse(str(epoch * 10**9)) == t
    with pytest.raises(ValueError):
        datetime_parser_named("unix_sec").parse("999999999999999999999")
    with pytest.raises(ValueError):
        datetime_parser_named("unix_sec").parse("12.5")


def test_date_range_query_uses_named_parser(spark):
    """Endpoint strings in a non-RFC3339 format resolve through the
    named parser at plan time."""
    import shutil

    from pyspark.sql import functions as F

    from bleve_spark import (
        FieldMapping,
        IndexBuilder,
        IndexMapping,
        SearchIndex,
        Searcher,
        SearchRequest,
    )
    from bleve_spark import query as Q
    from bleve_spark.analysis.datetimes import (
        PercentParser,
        register_datetime_parser,
    )

    path = "/tmp/bleve_spark_dates_test_index"
    shutil.rmtree(path, ignore_errors=True)
    m = IndexMapping(default_analyzer="keyword", compose_all=False)
    m.add(FieldMapping("name", analyzer="keyword"))
    corpus = spark.createDataFrame(
        [
            ("a", "2021-03-15 10:00:00"),
            ("b", "2021-09-01 08:30:00"),
            ("c", "2022-02-01 12:00:00"),
        ],
        ["name", "committed_at"],
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))
    IndexBuilder(spark, m, path).build(corpus, id_expr=F.col("name"))
    s = Searcher(SearchIndex(spark, path, m))

    register_datetime_parser("us_slash", PercentParser(["%Y/%m/%d"]))
    q_named = Q.DateRangeQuery(
        field="committed_at",
        start="2021/01/01",
        end="2021/12/31",
        datetime_parser="us_slash",
    )
    q_default = Q.DateRangeQuery(
        field="committed_at", start="2021-01-01", end="2021-12-31"
    )
    got_named = {
        r["_id"] for r in s.search(SearchRequest(query=q_named)).hits.collect()
    }
    got_default = {
        r["_id"]
        for r in s.search(SearchRequest(query=q_default)).hits.collect()
    }
    assert got_named == got_default == {"a", "b"}
    # an endpoint the parser cannot handle raises like the reference
    with pytest.raises(ValueError):
        s.search(
            SearchRequest(
                query=Q.DateRangeQuery(
                    field="committed_at",
                    start="Jan 1 2021",
                    datetime_parser="us_slash",
                )
            )
        )
