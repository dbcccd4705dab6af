"""Port of the reference geoshape POINTS searcher tables
(search/searcher/search_geoshape_points_test.go: point-contains,
multipoint-contains, multipoint-intersects) over the
setupGeoJsonShapesIndex fixture (ibid.:323-470 — polygon1, envelope1,
circle1 '900m', linestring1, multilinestring1, multipoint1,
polygonWithHole1). Expected doc-id sets are the reference's literals.
"""

import json

import pytest
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

_POLYGON1 = [[
    [77.5853419303894, 12.953977766785052], [77.58405447006226, 12.95393594361393],
    [77.5819730758667, 12.9495026476557], [77.58068561553955, 12.94883346405509],
    [77.58019208908081, 12.948331575175299], [77.57991313934326, 12.943814529775414],
    [77.58497714996338, 12.94394000436408], [77.58517026901245, 12.9446301134728],
    [77.58572816848755, 12.945508431393435], [77.58785247802734, 12.946365833997325],
    [77.58967638015747, 12.946428570657417], [77.59070634841918, 12.947474179333993],
    [77.59317398071289, 12.948875288082773], [77.59167194366454, 12.949962710338657],
    [77.59077072143555, 12.950276388953625], [77.59098529815674, 12.951196510612728],
    [77.58729457855225, 12.952472128200755], [77.5853419303894, 12.953977766785052],
]]

_POLYGON_WITH_HOLE1 = [
    [
        [77.59991168975829, 12.972232910164502], [77.6039457321167, 12.97582941279006],
        [77.60424613952637, 12.98168407323241], [77.59974002838135, 12.985489528568463],
        [77.59321689605713, 12.979300406693417], [77.59991168975829, 12.972232910164502],
    ],
    [
        [77.59682178497314, 12.975787593290978], [77.60295867919922, 12.975787593290978],
        [77.60295867919922, 12.98143316204164], [77.59682178497314, 12.98143316204164],
        [77.59682178497314, 12.975787593290978],
    ],
]

_SHAPES = [
    ("polygon1", {"type": "Polygon", "coordinates": _POLYGON1}),
    ("envelope1", {"type": "Envelope", "coordinates": [
        [80.93696594238281, 26.33957605983274],
        [81.28440856933594, 26.351267272877074]]}),
    ("circle1", {"type": "Circle",
                 "coordinates": [77.59137153625487, 12.952660333521468],
                 "radius": "900m"}),
    ("linestring1", {"type": "LineString", "coordinates": [
        [77.5841188430786, 12.957093573282744],
        [77.57776737213135, 12.952074805390097]]}),
    ("multilinestring1", {"type": "MultiLineString", "coordinates": [[
        [77.57227420806883, 12.948687079902895],
        [77.57600784301758, 12.954165970968194],
        [77.5779390335083, 12.94471376293191],
        [77.57218837738037, 12.948268838994263],
        [77.57781028747559, 12.951740217268595],
        [77.5779390335083, 12.945006535817749]]]}),
    ("multipoint1", {"type": "MultiPoint", "coordinates": [
        [77.56618022918701, 12.958180959662695],
        [77.56407737731932, 12.951614746607163],
        [77.56922721862793, 12.956173473406446]]}),
    ("polygonWithHole1", {"type": "Polygon",
                          "coordinates": _POLYGON_WITH_HOLE1}),
]


@pytest.fixture(scope="module")
def shapes_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("geoshape_searcher") / "idx")
    rows = [(name, json.dumps(shape)) for name, shape in _SHAPES]
    df = spark.createDataFrame(rows, "_id string, geometry string")
    m = IndexMapping(default_analyzer="keyword", dynamic=False).add(
        FieldMapping("geometry", type="geoshape", index=False)
    )
    IndexBuilder(spark, m, path).build(df, id_expr=F.col("_id"))
    return SearchIndex(spark, path, m)


def _run(idx, shape, relation):
    res = Searcher(idx).search(
        SearchRequest(
            query=Q.GeoShapeQuery(
                field="geometry", shape=shape, relation=relation
            ),
            size=20,
        )
    )
    return {r["_id"] for r in res.hits.collect()}


# search_geoshape_points_test.go:29-98 TestGeoJsonPointContainsQuery
_POINT_CONTAINS = [
    ([77.58334636688232, 12.948268838994263], {"polygon1"}),
    ([77.58553504943848, 12.954040501528555], {"circle1"}),
    ([77.59293794631958, 12.948896200093982], {"polygon1", "circle1"}),
    ([77.5614595413208, 12.953287683563568], set()),
    ([81.28166198730469, 26.34203746601541], {"envelope1"}),
    ([77.57776737213135, 12.952074805390097], set()),  # linestring vertex
    ([77.5779390335083, 12.945006535817749], set()),  # multiline vertex
    ([77.56407737731932, 12.951614746607163], {"multipoint1"}),
    ([77.60334491729736, 12.979844051951334], {"polygonWithHole1"}),
    ([77.60244369506836, 12.976247607394027], set()),  # inside the hole
]


@pytest.mark.parametrize("point,want", _POINT_CONTAINS)
def test_point_contains(spark, shapes_index, point, want):
    got = _run(
        shapes_index, {"type": "Point", "coordinates": point}, "contains"
    )
    assert got == want


# :100-192 TestGeoJsonMultiPointWithInQuery (relation "contains",
# multi=true: EVERY query point must be contained)
_MULTIPOINT_CONTAINS = [
    ([[77.58334636688232, 12.948268838994263],
      [77.58467674255371, 12.944295515355652]], {"polygon1"}),
    ([[77.58553504943848, 12.954040501528555],
      [77.58643627166747, 12.956089827794571]], {"circle1"}),
    ([[81.28166198730469, 26.34203746601541],
      [80.94314575195312, 26.346960121309415]], {"envelope1"}),
    ([[77.59293794631958, 12.948896200093982],
      [77.58532047271729, 12.953789562459688]], {"polygon1", "circle1"}),
    ([[77.58334636688232, 12.948268838994263],
      [77.58643627166747, 12.956089827794571],
      [77.5615, 12.9533]], set()),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097]], set()),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097],
      [77.58334636688232, 12.948268838994263]], set()),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263]], set()),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263],
      [77.58532047271729, 12.953789562459688]], set()),
    ([[77.60334491729736, 12.979844051951334],
      [77.60244369506836, 12.976247607394027]], set()),
    ([[77.59656429290771, 12.981767710239714],
      [77.59888172149658, 12.979969508380469]], set()),
    ([[77.60334491729736, 12.979844051951334],
      [77.59656429290771, 12.981767710239714],
      [77.59802341461182, 12.9751602999608]], {"polygonWithHole1"}),
]


@pytest.mark.parametrize("pts,want", _MULTIPOINT_CONTAINS)
def test_multipoint_contains(spark, shapes_index, pts, want):
    got = _run(
        shapes_index,
        {"type": "MultiPoint", "coordinates": pts},
        "contains",
    )
    assert got == want


# :194-289 TestGeoJsonMultiPointIntersectsQuery (ANY point suffices)
_MULTIPOINT_INTERSECTS = [
    ([[77.58334636688232, 12.948268838994263],
      [77.58467674255371, 12.944295515355652]], {"polygon1"}),
    ([[77.58553504943848, 12.954040501528555],
      [77.58643627166747, 12.956089827794571]], {"circle1"}),
    ([[81.28166198730469, 26.34203746601541],
      [80.94314575195312, 26.346960121309415],
      [81.12716674804688, 26.353728430338332]], {"envelope1"}),
    ([[77.59293794631958, 12.948896200093982],
      [77.58532047271729, 12.953789562459688]], {"polygon1", "circle1"}),
    ([[77.58334636688232, 12.948268838994263],
      [77.58643627166747, 12.956089827794571],
      [77.5615, 12.9533]], {"polygon1", "circle1"}),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097]], {"linestring1"}),
    ([[77.5841188430786, 12.957093573282744],
      [77.57776737213135, 12.952074805390097],
      [77.58334636688232, 12.948268838994263]],
     {"polygon1", "linestring1"}),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263]], {"multilinestring1"}),
    ([[77.5779390335083, 12.94471376293191],
      [77.57218837738037, 12.948268838994263],
      [77.58532047271729, 12.953789562459688]],
     {"polygon1", "circle1", "multilinestring1"}),
    ([[77.60334491729736, 12.979844051951334],
      [77.60244369506836, 12.976247607394027]], {"polygonWithHole1"}),
    ([[77.60244369506836, 12.976247607394027],
      [77.59888172149658, 12.979969508380469]], set()),
    ([[77.60334491729736, 12.979844051951334],
      [77.59656429290771, 12.981767710239714],
      [77.59802341461182, 12.9751602999608]], {"polygonWithHole1"}),
]


@pytest.mark.parametrize("pts,want", _MULTIPOINT_INTERSECTS)
def test_multipoint_intersects(spark, shapes_index, pts, want):
    got = _run(
        shapes_index,
        {"type": "MultiPoint", "coordinates": pts},
        "intersects",
    )
    assert got == want
