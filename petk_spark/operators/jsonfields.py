"""Semi-structured (JSON string) column profiling.

Event/telemetry tables carry JSON payload columns; a profile engine
must reach into them without a pre-declared schema. Extraction is
JVM-side (``get_json_object`` — no Python, no parse UDF); the grouped
rollup is one hash aggregation (map-side partials, single shuffle).

At 100 TB: extraction is a row-local projection over the scan; only the
(group × stat) rollup shuffles. For hot paths Spark users would migrate
the field to a real column — this operator is the exploration step that
tells you which fields deserve that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_numeric_field(json_col: str, field: str):
    """``$.field`` of a JSON string column as a double (null when the
    field is absent, non-numeric, or the JSON is malformed).

    ``try_cast``, not ``cast``: under Spark 4's default ANSI mode a
    plain cast THROWS on a non-numeric field value (e.g.
    ``{"k": "high"}``) — one such row in 100 TB of telemetry would kill
    the whole scan instead of profiling as absent. The DuckDB twin uses
    TRY_CAST for the same reason."""
    return F.get_json_object(F.col(json_col), f"$.{field}").try_cast("double")


def json_field_profile(
    df: DataFrame, json_col: str, field: str, group_col: str
) -> DataFrame:
    """Per-group numeric profile of one JSON field:
    (group, n, n_present, min, max, mean, sum)."""
    v = json_numeric_field(json_col, field)
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(v).alias("n_present"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.avg(v).alias("vmean"),
            F.sum(v).alias("vsum"),
        )
    )
