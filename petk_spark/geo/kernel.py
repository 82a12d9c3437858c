"""Arrow-batched Spark bindings for the WKT geometry kernel.

Each function returns a pandas UDF column over a WKT string column.
Batches cross the JVM↔Python boundary once per ~10k rows via Arrow;
per-geometry work is the pure-Python kernel in geo/wkt.py. At 100 TB
these UDFs scale with partition parallelism — no shuffle is introduced
by any of them (they are all row-local projections).

Reference parity: petk/exploration.py:52-66 (geo introspection) and
petk/validation.py:11-60 (geo rules).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from petk_spark.geo import wkt as K


def _series_map(s: pd.Series, fn):
    return s.map(lambda v: fn(K.parse_wkt(v)))


def geom_type(col: Column) -> Column:
    @F.pandas_udf(T.StringType())
    def u(s: pd.Series) -> pd.Series:
        return _series_map(s, lambda g: None if g is None else g.display_type)

    return u(col)


def has_z(col: Column) -> Column:
    @F.pandas_udf(T.BooleanType())
    def u(s: pd.Series) -> pd.Series:
        return _series_map(s, lambda g: None if g is None else g.has_z)

    return u(col)


_BOUNDS_TYPE = T.StructType(
    [
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
    ]
)


def bounds(col: Column) -> Column:
    @F.pandas_udf(_BOUNDS_TYPE)
    def u(s: pd.Series) -> pd.DataFrame:
        rows = [
            K.bounds(K.parse_wkt(v)) or (None, None, None, None) for v in s
        ]
        return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])

    return u(col)


_POINT_TYPE = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)


def centroid(col: Column) -> Column:
    @F.pandas_udf(_POINT_TYPE)
    def u(s: pd.Series) -> pd.DataFrame:
        rows = [K.centroid(K.parse_wkt(v)) or (None, None) for v in s]
        return pd.DataFrame(rows, columns=["x", "y"])

    return u(col)


_PROFILE_TYPE = T.StructType(
    [
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.BooleanType()),
        T.StructField("t", T.StringType()),
    ]
)


def geo_profile(col: Column) -> Column:
    """Fused per-geometry profile: bounds + centroid + has_z + type from
    ONE WKT parse (introduce needs all four; separate UDFs cost four
    parses per geometry and four Arrow passes)."""

    @F.pandas_udf(_PROFILE_TYPE)
    def u(s: pd.Series) -> pd.DataFrame:
        rows = []
        for v in s:
            g = K.parse_wkt(v)
            if g is None:
                rows.append((None,) * 8)
                continue
            b = K.bounds(g) or (None, None, None, None)
            c = K.centroid(g) or (None, None)
            rows.append((*b, *c, g.has_z, g.display_type))
        return pd.DataFrame(
            rows, columns=["minx", "miny", "maxx", "maxy", "x", "y", "z", "t"]
        )

    return u(col)


def validity_reason(col: Column) -> Column:
    """NULL when valid, else the shapely-style reason string."""

    @F.pandas_udf(T.StringType())
    def u(s: pd.Series) -> pd.Series:
        return s.map(lambda v: K.explain_validity(K.parse_wkt(v)))

    return u(col)


_VALIDATE_TYPE = T.StructType(
    [
        T.StructField("reason", T.StringType()),
        T.StructField("inside", T.BooleanType()),
        T.StructField("sliver_n", T.IntegerType()),
    ]
)


def validate_profile(
    col: Column,
    bbox: tuple[float, float, float, float] | None,
    sliver: tuple[float, int] | None,
) -> Column:
    """Fused per-geometry rule inputs — validity reason, bbox membership,
    sliver count — from ONE WKT parse. The unioned rule plan runs one
    pandas-UDF branch per rule otherwise, re-parsing every geometry per
    rule; parameters are plan literals so the column stays a row-local
    projection."""

    @F.pandas_udf(_VALIDATE_TYPE)
    def u(s: pd.Series) -> pd.DataFrame:
        rows = []
        for v in s:
            g = K.parse_wkt(v)
            reason = K.explain_validity(g)
            inside = (
                K.intersects_bbox(g, *bbox) if bbox is not None else None
            )
            sn = (
                K.sliver_count(g, sliver[0], sliver[1])
                if sliver is not None
                else None
            )
            rows.append((reason, inside, sn))
        return pd.DataFrame(rows, columns=["reason", "inside", "sliver_n"])

    return u(col)


def intersects_bbox(col: Column, xmin: float, xmax: float, ymin: float, ymax: float) -> Column:
    @F.pandas_udf(T.BooleanType())
    def u(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: K.intersects_bbox(K.parse_wkt(v), xmin, xmax, ymin, ymax)
        )

    return u(col)


def sliver_count(col: Column, threshold: float, epsg: int) -> Column:
    @F.pandas_udf(T.IntegerType())
    def u(s: pd.Series) -> pd.Series:
        return s.map(lambda v: K.sliver_count(K.parse_wkt(v), threshold, epsg))

    return u(col)
