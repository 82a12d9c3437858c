"""Geospatial dataset rollups for ``introduce()`` (SURVEY §2.B7-B11).

Reference parity: petk/exploration.py:52-66 — CRS, centroid location,
total bounds, 3D-shape count, geometry-type histogram. Emitted as extra
rows of the introduce long frame ``(section, metric, value_num,
value_str)`` with section='geospatial'.

Execution: ONE fused aggregate over a single projection of the geometry
kernel UDF outputs (bounds/centroid/has_z computed per row in one Arrow
batch pass), plus one groupBy for the type histogram — two jobs total,
both scale-free of geometry complexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petk_spark.geo import kernel


def introduce_geo_frame(
    df: DataFrame, geometry_col: str = "geometry", crs: str | None = None
) -> DataFrame:
    g = F.col(geometry_col)
    proj = df.select(
        kernel.bounds(g).alias("b"),
        kernel.centroid(g).alias("c"),
        kernel.has_z(g).alias("z"),
        kernel.geom_type(g).alias("t"),
    )

    agg = proj.agg(
        F.min("b.minx").alias("minx"),
        F.min("b.miny").alias("miny"),
        F.max("b.maxx").alias("maxx"),
        F.max("b.maxy").alias("maxy"),
        F.avg("c.x").alias("cx"),
        F.avg("c.y").alias("cy"),
        F.sum(F.col("z").cast("long")).alias("n3d"),
    )

    def entry(metric, num, s=None):
        return F.struct(
            F.lit("geospatial").alias("section"),
            F.lit(metric).alias("metric"),
            (F.lit(None).cast("double") if num is None else num.cast("double")).alias(
                "value_num"
            ),
            (F.lit(None).cast("string") if s is None else s).alias("value_str"),
        )

    scalar = agg.select(
        F.explode(
            F.array(
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
        ).alias("e")
    ).select("e.*")

    hist = (
        proj.filter(F.col("t").isNotNull())
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("geospatial").alias("section"),
            F.concat(F.lower(F.col("t")), F.lit("s")).alias("metric"),
            F.col("n").cast("double").alias("value_num"),
            F.lit(None).cast("string").alias("value_str"),
        )
    )
    return scalar.unionByName(hist)
