"""Geospatial validation rules (SURVEY §2.D3-D5).

Reference parity: petk/validation.py:11-19 (bounding_box), :30-34
(geospatial validity), :53-60 (sliver). Messages replicate the
reference exactly. Each rule is a lazy filter+project over the source;
the geometry predicates are Arrow-batched pandas UDFs (geo/kernel.py).

Registered into operators.validate.RULE_REGISTRY on import of
``petk_spark.geo`` (kept separate so text/numeric-only deployments pay
no geometry import cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petk_spark.geo import kernel
from petk_spark.operators.validate import row_key_expr


def rule_bounding_box(df: DataFrame, column: str, key, bbox) -> DataFrame:
    xmin, xmax, ymin, ymax = bbox
    assert xmin < xmax and ymin < ymax, "Invalid bounding box given"
    msg = f"Geometry outside of bbox({xmin}, {xmax}, {ymin}, {ymax})"
    inside = kernel.intersects_bbox(F.col(column), xmin, xmax, ymin, ymax)
    # Null geometries are outside every .cx slice in the reference, so
    # they ARE flagged (petk/validation.py:17-19): coalesce NULL→False.
    return df.filter(~F.coalesce(inside, F.lit(False))).select(
        F.lit(column).alias("column"),
        row_key_expr(key).alias("row_key"),
        F.lit("bounding_box").alias("function"),
        F.lit(msg).alias("notes"),
    )


def rule_geospatial(df: DataFrame, column: str, key, _params=None) -> DataFrame:
    """Implicit validity audit: runs for every geometry column whether or
    not the schema mentions it (petk/exploration.py:95-99)."""
    reason = kernel.validity_reason(F.col(column))
    return (
        df.select(
            F.lit(column).alias("column"),
            row_key_expr(key).alias("row_key"),
            F.lit("geospatial").alias("function"),
            reason.alias("notes"),
        )
        .filter(F.col("notes").isNotNull())
    )


def fused_geo_part(
    df: DataFrame, column: str, key, rules: dict, include_validity: bool
) -> DataFrame:
    """All geometry rules for one column from ONE parse: a fused kernel
    UDF yields (validity reason, bbox membership, sliver count) per
    geometry; each active rule becomes a conditional violation entry
    exploded out of that single projection. Semantics are identical to
    the per-rule branches (rule_bounding_box / rule_geospatial /
    rule_sliver above, which remain the registry's single-rule path);
    this fusion only changes the parse count — measured 2 parses per
    geometry → 1 for the declared bbox+validity audit."""
    bbox = rules.get("bounding_box")
    sliver_params = rules.get("sliver")
    if bbox is not None:
        xmin, xmax, ymin, ymax = bbox
        assert xmin < xmax and ymin < ymax, "Invalid bounding box given"
    sliver = (
        (float(sliver_params["threshold"]), int(sliver_params["projected_coordinates"]))
        if sliver_params is not None
        else None
    )

    # The kernel UDF runs per input partition: a 3-split parquet scan on
    # a 32-slot machine would starve it (same fix as the fused describe
    # bundle; no-op when the scan already has enough splits). Project to
    # the key + geometry first so the fan-out shuffle carries only them.
    from petk_spark.operators.describe import ensure_parallelism

    key_list = [key] if isinstance(key, str) else list(key)
    src = ensure_parallelism(df.select(*dict.fromkeys([*key_list, column])))
    p = kernel.validate_profile(F.col(column), tuple(bbox) if bbox else None, sliver)
    keyed = src.select(row_key_expr(key).alias("row_key"), p.alias("p"))

    def violation(function: str, notes):
        return F.struct(
            F.lit(function).alias("function"), notes.alias("notes")
        )

    entries = []
    if bbox is not None:
        msg = f"Geometry outside of bbox({xmin}, {xmax}, {ymin}, {ymax})"
        entries.append(
            F.when(
                ~F.coalesce(F.col("p.inside"), F.lit(False)),
                violation("bounding_box", F.lit(msg)),
            )
        )
    if include_validity:
        entries.append(
            F.when(
                F.col("p.reason").isNotNull(),
                violation("geospatial", F.col("p.reason")),
            )
        )
    if sliver is not None:
        entries.append(
            F.when(
                F.col("p.sliver_n") > 0,
                violation(
                    "sliver",
                    F.concat(
                        F.col("p.sliver_n").cast("string"),
                        F.lit(" slivers found within geometry"),
                    ),
                ),
            )
        )

    return (
        keyed.select("row_key", F.explode(F.array(*entries)).alias("e"))
        .filter(F.col("e").isNotNull())
        .select(
            F.lit(column).alias("column"),
            "row_key",
            F.col("e.function").alias("function"),
            F.col("e.notes").alias("notes"),
        )
    )


def rule_sliver(df: DataFrame, column: str, key, params) -> DataFrame:
    threshold = params["threshold"]
    epsg = params["projected_coordinates"]
    n = kernel.sliver_count(F.col(column), float(threshold), int(epsg))
    return (
        df.withColumn("__slivers", n)
        .filter(F.col("__slivers") > 0)
        .select(
            F.lit(column).alias("column"),
            row_key_expr(key).alias("row_key"),
            F.lit("sliver").alias("function"),
            F.concat(
                F.col("__slivers").cast("string"),
                F.lit(" slivers found within geometry"),
            ).alias("notes"),
        )
    )


def register() -> None:
    from petk_spark.operators.validate import RULE_REGISTRY

    RULE_REGISTRY.setdefault("bounding_box", rule_bounding_box)
    RULE_REGISTRY.setdefault("geospatial", rule_geospatial)
    RULE_REGISTRY.setdefault("sliver", rule_sliver)
