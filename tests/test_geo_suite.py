"""Port of the reference geo golden suite
/root/reference/test/tests/geo/ (9 breweries; distance, bounding box,
polygon queries in every point format incl. GeoJSON arrays, lat-lon
strings, and geohashes; geo_distance sort)."""

import shutil

import pytest
from pyspark.sql import functions as F, types as T

from bleve_spark import (
    FieldMapping,
    IndexBuilder,
    IndexMapping,
    SearchIndex,
    Searcher,
    SearchRequest,
    parse_query,
)

SUITE_DIR = "/tmp/bleve_spark_geo_suite_index"

BREWERIES = [
    # ref: test/tests/geo/data/*.json (id, name, lat, lon)
    ("amoeba_brewery", "amoeba brewery", 12.97467, 77.6049),
    ("brewpub_on_the_green", "Brewpub-on-the-Green", 37.5483, -121.989),
    ("capital_city_brewing_company", "Capital City Brewing Company",
     38.8999, -77.0272),
    ("communiti_brewery", "communiti brewery", 12.97237, 77.608237),
    ("firehouse_grill_brewery", "Firehouse Grill & Brewery",
     37.3775, -122.03),
    ("hook_ladder_brewing_company", "Hook & Ladder Brewing Company",
     38.9911, -77.0237),
    ("jack_s_brewing", "Jack's Brewing", 37.5441, -121.988),
    ("social_brewery", "social brewery", 12.9736946, 77.6042133),
    ("sweet_water_tavern_and_brewery", "Sweet Water Tavern and Brewery",
     39.0324, -77.4097),
]

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField(
            "geo",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                ]
            ),
        ),
    ]
)


@pytest.fixture(scope="module")
def geo_index(spark):
    shutil.rmtree(SUITE_DIR, ignore_errors=True)
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    m.add(FieldMapping("name"))
    rows = [(i, n, {"lat": la, "lon": lo}) for i, n, la, lo in BREWERIES]
    corpus = spark.createDataFrame(rows, schema=SCHEMA)
    IndexBuilder(spark, m, SUITE_DIR).build(corpus, id_expr=F.col("id"))
    return SearchIndex(spark, SUITE_DIR, m)


def run(index, query, sort):
    res = Searcher(index).search(
        SearchRequest(query=parse_query(query), sort=sort, with_total=True)
    )
    return [r["_id"] for r in res.hits.collect()], res.total


CB = {"lon": -122.107799, "lat": 37.399285}
DC = {"lon": -77.0365, "lat": 38.8977}

GEO_CASES = [
    ("distance cb office",
     {"location": CB, "distance": "100mi", "field": "geo"},
     [{"by": "geo_distance", "field": "geo", "unit": "mi", "location": CB}],
     ["firehouse_grill_brewery", "jack_s_brewing", "brewpub_on_the_green"]),
    ("distance whitehouse",
     {"location": DC, "distance": "100mi", "field": "geo"},
     [{"by": "geo_distance", "field": "geo", "unit": "mi", "location": DC}],
     ["capital_city_brewing_company", "hook_ladder_brewing_company",
      "sweet_water_tavern_and_brewery"]),
    ("bbox usa",
     {"top_left": {"lon": -125.0011, "lat": 49.5904},
      "bottom_right": {"lon": -66.9326, "lat": 24.9493}, "field": "geo"},
     ["name"],
     ["brewpub_on_the_green", "capital_city_brewing_company",
      "firehouse_grill_brewery", "hook_ladder_brewing_company",
      "jack_s_brewing", "sweet_water_tavern_and_brewery"]),
    ("bbox dc",
     {"top_left": {"lon": -78, "lat": 39.5},
      "bottom_right": {"lon": -76, "lat": 38.5}, "field": "geo"},
     ["name"],
     ["capital_city_brewing_company", "hook_ladder_brewing_company",
      "sweet_water_tavern_and_brewery"]),
    ("distance geojson point",
     {"location": [-122.107799, 37.399285], "distance": "100mi",
      "field": "geo"},
     [{"by": "geo_distance", "field": "geo", "unit": "mi",
       "location": [-122.107799, 37.399285]}],
     ["firehouse_grill_brewery", "jack_s_brewing", "brewpub_on_the_green"]),
    ("bbox geojson",
     {"top_left": [-78, 39.5], "bottom_right": [-76, 38.5], "field": "geo"},
     ["name"],
     ["capital_city_brewing_company", "hook_ladder_brewing_company",
      "sweet_water_tavern_and_brewery"]),
    ("polygon geojson arrays",
     {"polygon_points": [[77.607749, 12.974872], [77.6101101, 12.971725],
                         [77.606912, 12.97253], [77.60378, 12.975112]],
      "field": "geo"},
     ["name"],
     ["amoeba_brewery", "communiti_brewery"]),
    ("polygon latlon strings",
     {"polygon_points": ["12.974872, 77.607749", "12.971725, 77.6101101",
                         "12.972530, 77.606912", "12.975112, 77.603780"],
      "field": "geo"},
     ["name"],
     ["amoeba_brewery", "communiti_brewery"]),
    ("polygon objects",
     {"polygon_points": [{"lat": 12.974872, "lon": 77.607749},
                         {"lat": 12.971725, "lon": 77.6101101},
                         {"lat": 12.97253, "lon": 77.606912},
                         {"lat": 12.975112, "lon": 77.60378}],
      "field": "geo"},
     ["name"],
     ["amoeba_brewery", "communiti_brewery"]),
    ("polygon geohashes",
     {"polygon_points": ["tdr1y40", "tdr1y13", "tdr1vcx", "tdr1vfj"],
      "field": "geo"},
     ["name"],
     ["amoeba_brewery", "communiti_brewery"]),
]


@pytest.mark.parametrize(
    "case", GEO_CASES, ids=[c[0].replace(" ", "_") for c in GEO_CASES]
)
def test_geo_case(geo_index, case):
    _name, query, sort, exp = case
    ids, total = run(geo_index, query, sort)
    assert ids == exp
    assert total == len(exp)
