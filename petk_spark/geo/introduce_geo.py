"""Geospatial dataset rollups for ``introduce()`` (SURVEY §2.B7-B11).

Reference parity: petk/exploration.py:52-66 — CRS, centroid location,
total bounds, 3D-shape count, geometry-type histogram. Emitted as extra
rows of the introduce long frame ``(section, metric, value_num,
value_str)`` with section='geospatial'.

Execution: ONE job, ONE WKT parse per geometry. The per-geometry
profile (bounds/centroid/has_z/type) comes from a single fused pandas
UDF (geo/kernel.geo_profile), and the dataset scalars + the
geometry-type histogram come from a single ``rollup(t)`` aggregation:
the grand-total row carries bounds/centroid/3D-count, the leaf rows
carry per-type counts. An earlier variant union-branched a global agg
and a groupBy over the same projection, which recomputed the scan and
the UDF per branch (5 parses per geometry total — measured ~2.4× the
fused plan at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petk_spark.geo import kernel


def introduce_geo_frame(
    df: DataFrame, geometry_col: str = "geometry", crs: str | None = None
) -> DataFrame:
    from petk_spark.operators.describe import ensure_parallelism

    g = F.col(geometry_col)
    proj = (
        ensure_parallelism(df.select(geometry_col))
        .select(kernel.geo_profile(g).alias("p"))
        .select("p.minx", "p.miny", "p.maxx", "p.maxy", "p.x", "p.y", "p.z", "p.t")
    )

    rolled = proj.rollup("t").agg(
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
        F.avg("x").alias("cx"),
        F.avg("y").alias("cy"),
        F.sum(F.col("z").cast("long")).alias("n3d"),
        F.count(F.lit(1)).alias("n"),
        F.grouping("t").alias("gt"),
    )

    def entry(metric, num, s=None):
        return F.struct(
            F.lit("geospatial").alias("section"),
            (F.lit(metric) if isinstance(metric, str) else metric).alias("metric"),
            (F.lit(None).cast("double") if num is None else num.cast("double")).alias(
                "value_num"
            ),
            (F.lit(None).cast("string") if s is None else s).alias("value_str"),
        )

    scalar_entries = F.array(
        entry("crs", None, F.lit(crs)),
        entry(
            "centroid_location",
            None,
            F.concat_ws(", ", F.col("cx").cast("string"), F.col("cy").cast("string")),
        ),
        entry("bounds_minx", F.col("minx")),
        entry("bounds_miny", F.col("miny")),
        entry("bounds_maxx", F.col("maxx")),
        entry("bounds_maxy", F.col("maxy")),
        entry("3d_shapes", F.coalesce(F.col("n3d"), F.lit(0))),
    )
    # Geometry-type histogram rows (value_counts drops nulls, so the
    # t-IS-NULL leaf group — null geometries — emits nothing).
    hist_entries = F.array(
        entry(F.concat(F.lower(F.col("t")), F.lit("s")), F.col("n"))
    )

    return (
        rolled.filter((F.col("gt") == 1) | F.col("t").isNotNull())
        .select(
            F.explode(
                F.when(F.col("gt") == 1, scalar_entries).otherwise(hist_entries)
            ).alias("e")
        )
        .select("e.*")
    )
