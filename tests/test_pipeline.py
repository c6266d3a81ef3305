"""End-to-end: spans + geometry → spatial locale → lanes, golden-checked.

This is the engine-shaped replacement for the reference's `Way {id}` path
(overpass fetch → locale from enclosing areas → transform, §3.2 of
SURVEY.md): locale comes from the containment join instead of a remote
call, and the transform output still matches the golden corpus for every
case that carries an ISO code whose customary driving side matches the
case (i.e. where geography alone determines the locale).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from osm2lanes_spark.core.compare import diff_road, road_eq_expected
from osm2lanes_spark.core.locale import COUNTRIES
from osm2lanes_spark.fixtures import geography as G
from osm2lanes_spark.fixtures.golden import (expected_has_separators,
                                             filter_enabled_lanes, load_cases)
from osm2lanes_spark.operators.lane_transform import arrow_lanes_to_internal
from osm2lanes_spark.pipeline import lanes_pipeline, resolve_locale
from osm2lanes_spark.spatial.raster import rasterize_points, zonal_join


@pytest.fixture(scope="module")
def geo_cases():
    """Golden cases with an ISO country whose dim driving side matches."""
    out = []
    for c in load_cases():
        iso = c["iso_3166_2"]
        if not iso:
            continue
        a2 = iso.split("-")[0]
        if a2 in COUNTRIES and COUNTRIES[a2][2] == c["driving_side"]:
            out.append(c)
    return out


@pytest.fixture(scope="module")
def geo_docs(spark, geo_cases):
    from osm2lanes_spark.fixtures.golden import tags_to_spans

    rows = []
    for c in geo_cases:
        a2 = c["iso_3166_2"].split("-")[0]
        lon, lat = G.doc_point(c["case_id"], a2)
        inc = c["include_separators"] and expected_has_separators(c)
        rows.append((c["case_id"], tags_to_spans(c["case_id"], c["tags"]),
                     float(lon), float(lat), bool(inc)))
    schema = ("doc_id string, "
              "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
              "lon double, lat double, include_separators boolean")
    return spark.createDataFrame(rows, schema)


def test_resolve_locale(spark, geo_docs, geo_cases):
    polys = G.all_country_polygons()
    out = resolve_locale(geo_docs, polys, level=10)
    got = {r["doc_id"]: (r["iso_3166_2"], r["driving_side"]) for r in out.collect()}
    for c in geo_cases:
        a2 = c["iso_3166_2"].split("-")[0]
        assert got[c["case_id"]] == (a2, c["driving_side"]), c["case_id"]


@pytest.mark.parametrize("fused", [True, False])
def test_pipeline_golden(spark, geo_docs, geo_cases, fused):
    polys = G.all_country_polygons()
    result = lanes_pipeline(geo_docs, polys, level=10, fused=fused)
    rows = {r["doc_id"]: r for r in result.collect()}
    assert len(rows) == len(geo_cases)
    for c in geo_cases:
        row = rows[c["case_id"]]
        assert row["error"] is None, f"{c['case_id']}: {row['error']}"
        actual = filter_enabled_lanes(c, arrow_lanes_to_internal(row["lanes"]))
        expected = filter_enabled_lanes(c, c["expected_lanes"])
        assert road_eq_expected(actual, expected), \
            f"{c['case_id']} {c['description']}\n{diff_road(actual, expected)}"


def test_zonal_join(spark):
    # raster: average of synthetic speed samples; way covers known cells
    pts = spark.createDataFrame(
        [(10.0 + 0.001 * i, 20.0, float(50 + (i % 3) * 10)) for i in range(60)],
        "lon double, lat double, speed double")
    raster = rasterize_points(pts, "speed", level=12, agg="avg")
    assert raster.count() >= 1
    ways = spark.createDataFrame(
        [("w1", [{"lon": 10.0, "lat": 20.0}, {"lon": 10.05, "lat": 20.0}]),
         ("w2", [{"lon": -10.0, "lat": -20.0}])],
        "way_id string, geometry array<struct<lon:double,lat:double>>")
    out = zonal_join(ways, raster, level=12, broadcast_raster=True)
    rows = {r["way_id"]: r for r in out.collect()}
    assert "w1" in rows and rows["w1"]["zonal_max"] >= 50.0
    assert "w2" not in rows  # no raster coverage there
