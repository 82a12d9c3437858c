"""Geometry kernel golden tests — FIXTURES.md §B4.

The reference's geo surface is oracle-~ (duckdb has no spatial
extension here), so correctness is pinned by goldens on hand-built WKT:
validity messages, bbox violations, sliver counts, type histogram,
bounds and 3D counts (petk/validation.py:11-60, petk/exploration.py:52-66).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.geo import wkt as K

WKT_ROWS = [
    (1, "POLYGON((-79.4 43.6, -79.3 43.6, -79.3 43.7, -79.4 43.7, -79.4 43.6))"),
    (2, "POLYGON((0 0, 1 1, 1 0, 0 1, 0 0))"),
    (3, "MULTIPOLYGON(((-79.40 43.65, -79.4000001 43.65, -79.4000001 43.6500001, -79.40 43.65)), "
        "((-79.39 43.64, -79.38 43.64, -79.38 43.65, -79.39 43.65, -79.39 43.64)))"),
    (4, "LINESTRING(-79.4 43.6, -79.4000001 43.6)"),
    (5, "POINT Z(-79.4 43.6 100)"),
    (6, None),
]


# ---------------------------------------------------------------------------
# pure-kernel goldens (no Spark needed)
# ---------------------------------------------------------------------------

def test_parse_types():
    types = {gid: (K.parse_wkt(w).display_type if w else None) for gid, w in WKT_ROWS}
    assert types == {
        1: "Polygon", 2: "Polygon", 3: "MultiPolygon",
        4: "LineString", 5: "Point", 6: None,
    }


def test_validity():
    assert K.explain_validity(K.parse_wkt(WKT_ROWS[0][1])) is None
    bowtie = K.explain_validity(K.parse_wkt(WKT_ROWS[1][1]))
    assert bowtie is not None and bowtie.startswith("Self-intersection")
    assert "0.5" in bowtie  # bowtie crosses at (0.5, 0.5)
    assert K.explain_validity(None) == "Null geometry"


def test_bbox():
    inside = K.intersects_bbox(K.parse_wkt(WKT_ROWS[0][1]), -80, -79, 43, 44)
    outside = K.intersects_bbox(K.parse_wkt(WKT_ROWS[1][1]), -80, -79, 43, 44)
    assert inside and not outside


def test_sliver_counts():
    # gid 3: one ~1e-7 deg sliver triangle of 2 parts; gid 4: ~1 cm line.
    assert K.sliver_count(K.parse_wkt(WKT_ROWS[2][1]), 1.0, 32617) == 1
    assert K.sliver_count(K.parse_wkt(WKT_ROWS[3][1]), 1.0, 32617) == 1
    # Points never sliver; real-sized polygon is not a sliver.
    assert K.sliver_count(K.parse_wkt(WKT_ROWS[4][1]), 1.0, 32617) == 0
    assert K.sliver_count(K.parse_wkt(WKT_ROWS[0][1]), 1.0, 32617) == 0


def test_bounds_and_z():
    g = K.parse_wkt(WKT_ROWS[0][1])
    assert K.bounds(g) == (-79.4, 43.6, -79.3, 43.7)
    assert K.parse_wkt(WKT_ROWS[4][1]).has_z
    assert not K.parse_wkt(WKT_ROWS[0][1]).has_z


def test_centroid():
    g = K.parse_wkt(WKT_ROWS[0][1])
    cx, cy = K.centroid(g)
    assert abs(cx - (-79.35)) < 1e-9 and abs(cy - 43.65) < 1e-9


def test_utm_projection_sane():
    # ~0.1 deg of longitude at Toronto latitude ≈ 8 km; the spherical TM
    # approximation must land within 5% of that.
    x0, y0 = K._utm_project(-79.4, 43.65, 17)
    x1, y1 = K._utm_project(-79.3, 43.65, 17)
    assert abs((x1 - x0) - 8065) < 400


# ---------------------------------------------------------------------------
# Spark integration: implicit geospatial rule + explicit geo rules
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def geo_df(spark):
    return spark.createDataFrame(
        [(gid, w) for gid, w in WKT_ROWS], "gid long, geometry string"
    )


def test_validate_implicit_geospatial(spark, geo_df):
    from petk_spark.report import Report

    report = Report(geo_df, key="gid")
    out = report.validate()
    rows = {(r["row_key"], r["function"]): r["notes"] for r in out.collect()}
    assert rows[("2", "geospatial")].startswith("Self-intersection")
    assert rows[("6", "geospatial")] == "Null geometry"
    assert ("1", "geospatial") not in rows


def test_validate_bbox_and_sliver(spark, geo_df):
    from petk_spark.report import Report

    schema = {
        "geometry": {
            "bounding_box": [-80, -79, 43, 44],
            "sliver": {"threshold": 1.0, "projected_coordinates": 32617},
        }
    }
    report = Report(geo_df, schema=schema, key="gid")
    out = report.validate()
    rows = {(r["row_key"], r["function"]): r["notes"] for r in out.collect()}
    assert rows[("2", "bounding_box")] == "Geometry outside of bbox(-80, -79, 43, 44)"
    # Null geometry does not intersect → also flagged (geopandas .cx drops it).
    assert ("6", "bounding_box") in rows
    assert rows[("3", "sliver")] == "1 slivers found within geometry"
    assert rows[("4", "sliver")] == "1 slivers found within geometry"
    assert ("1", "sliver") not in rows


def test_introduce_geo(spark, geo_df):
    from petk_spark.geo.introduce_geo import introduce_geo_frame

    out = introduce_geo_frame(geo_df, "geometry", crs="epsg:4326")
    rows = {r["metric"]: (r["value_num"], r["value_str"]) for r in out.collect()}
    assert rows["crs"][1] == "epsg:4326"
    assert rows["polygons"][0] == 2.0
    assert rows["multipolygons"][0] == 1.0
    assert rows["linestrings"][0] == 1.0
    assert rows["points"][0] == 1.0
    assert rows["3d_shapes"][0] == 1.0
    assert rows["bounds_minx"][0] == -79.4000001  # gid 3's sliver vertex
    assert rows["bounds_maxx"][0] == 1.0  # the bowtie's maxx


def test_describe_geo_column_gating(spark, geo_df):
    """GEO columns get base stats only — no distinct/numeric stats
    (petk/tools.py:27 gates them out)."""
    from petk_spark.operators.describe import describe_frame

    out = describe_frame(geo_df, ["geometry"])
    stats = {r["statistic"] for r in out.collect()}
    assert "count" in stats and "content_type" in stats
    assert "distinct_count" not in stats and "mean" not in stats
