"""Profile drift between two table snapshots (SURVEY §2.F17).

The data-ops monitoring primitive: given yesterday's and today's frame
(or any two snapshots), report per-column statistic pairs so alerting
can threshold on the deltas. Complements describe(): this is the
two-sided comparison, describe() the one-sided profile.

Scale: one fused aggregate bundle per side (same single-scan shape as
describe's stats pass), the two 1-row results cross-joined broadcast —
no shuffle beyond the two aggregations, no driver collection. The
reshape to long form is a constant-size explode of the 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: statistic name → SQL aggregate template over the double-cast column.
_STATS = {
    "count": "count({v})",
    "n_null": "sum(CAST({c} IS NULL AS BIGINT))",
    "mean": "avg({v})",
    "std": "stddev_samp({v})",
    "vmin": "min({v})",
    "vmax": "max({v})",
}


def _bundle(df: DataFrame, columns, suffix: str) -> DataFrame:
    aggs = []
    for c in columns:
        v = f"CAST(`{c}` AS DOUBLE)"
        for stat, tpl in _STATS.items():
            aggs.append(
                tpl.format(v=v, c=f"`{c}`") + f" AS `{c}::{stat}::{suffix}`"
            )
    return df.agg(*[F.expr(a) for a in aggs])


def completeness_over_time(
    df: DataFrame,
    ts_col: str,
    columns: list[str],
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Missingness monitoring: per time bucket and column, row count,
    null count and null rate — the time-resolved view of describe's
    ``p_null`` that catches an upstream feed silently going dark for an
    hour (a global null rate dilutes such an outage into noise).

    Long output ``(bucket_start, col_name, n_rows, n_null, p_null)``.
    Plan: ONE scan, one hash shuffle on ≤ (windows × columns) group
    keys — the per-column fan-out is an inline explode of constant-size
    structs, not a join. ``ts_col`` is epoch seconds; bucketing is
    ``floor(ts / bucket)`` so both engines bin identically."""
    b = F.floor(F.col(ts_col).cast("double") / F.lit(float(bucket_seconds)))
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(c).isNull().cast("long").alias("is_null"),
        )
        for c in columns
    ]
    long = df.select(
        (b * F.lit(float(bucket_seconds))).alias("bucket_start"),
        F.explode(F.array(*structs)).alias("e"),
    ).select("bucket_start", "e.*")
    return long.groupBy("bucket_start", "col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_null").alias("n_null"),
        F.try_divide(F.sum("is_null"), F.count(F.lit(1))).alias("p_null"),
    )


def psi_grid(df: DataFrame, column: str) -> DataFrame:
    """1-row (lo, hi) bin grid from the baseline snapshot — the shared
    grid contract of batch ``psi_drift`` and ``streaming_psi``."""
    v = f"CAST(`{column}` AS DOUBLE)"
    return df.agg(F.expr(f"min({v}) AS lo"), F.expr(f"max({v}) AS hi"))


def psi_bin_rows(
    df: DataFrame,
    column: str,
    grid: DataFrame,
    n_bins: int,
    keep: tuple = (),
) -> DataFrame:
    """Row-level ``(keep..., bin)`` frame over the broadcast grid — the
    ONE binning convention both the batch and streaming PSI use (a
    divergence here silently breaks their documented parity).

    NULL/NaN are filtered BEFORE the clamp: Spark's ``greatest()``
    SKIPS null arguments (unlike a null-propagating engine), so
    ``greatest(NULL, 0)`` is 0 and an unfiltered NULL value would
    silently land in bin 0, inflating the denominator. (Caught by the
    perturbed-orders fixture: one NULL price shifted every p_a/p_b by
    1/n.)"""
    v = f"CAST(`{column}` AS DOUBLE)"
    return (
        df.where(f"{v} IS NOT NULL AND NOT isnan({v})")
        .crossJoin(F.broadcast(grid))
        .selectExpr(
            *keep,
            f"least(greatest(CAST(floor(({v} - lo) / "
            f"(CASE WHEN hi > lo THEN (hi - lo) / {n_bins} ELSE 1.0 END)"
            f") AS INT), 0), {n_bins - 1}) AS bin",
        )
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column: ``(bin, p_a, p_b, psi_term)`` plus a total row (bin = -1).

    PSI = Σ (p_a − p_b)·ln(p_a / p_b) over fixed-width bins spanning
    snapshot A's [min, max] (the standard monitoring convention:
    baseline defines the grid; B values outside clamp to the edge
    bins). ``eps`` floors empty-bin proportions so the log stays
    finite — the same floor both sides, engine-portable.

    Scale: one agg on A for the grid (min/max — could come from footer
    stats), then one ``floor((x−lo)/w)``-keyed count per side: two
    scans, one tiny shuffle each (≤ n_bins groups), broadcast join of
    two ≤ n_bins-row frames. No windows, no Python."""
    grid = psi_grid(df_a, column)

    def binned(df: DataFrame, side: str) -> DataFrame:
        return psi_bin_rows(df, column, grid, n_bins).groupBy("bin").agg(
            F.count(F.lit(1)).alias(f"n_{side}")
        )

    a, b = binned(df_a, "a"), binned(df_b, "b")
    bins = df_a.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(F.broadcast(a), "bin", "left")
        .join(F.broadcast(b), "bin", "left")
        .selectExpr(
            "bin",
            "CAST(coalesce(n_a, 0) AS DOUBLE) AS n_a",
            "CAST(coalesce(n_b, 0) AS DOUBLE) AS n_b",
        )
    )
    terms = joined.selectExpr(
        "bin",
        f"greatest(n_a / sum(n_a) OVER (), {eps!r}) AS p_a",
        f"greatest(n_b / sum(n_b) OVER (), {eps!r}) AS p_b",
    ).selectExpr(
        "bin", "p_a", "p_b", "(p_a - p_b) * ln(p_a / p_b) AS psi_term"
    )
    total = terms.groupBy().agg(
        F.expr("-1 AS bin"),
        F.expr("CAST(NULL AS DOUBLE) AS p_a"),
        F.expr("CAST(NULL AS DOUBLE) AS p_b"),
        F.expr("sum(psi_term) AS psi_term"),
    ).select("bin", "p_a", "p_b", "psi_term")
    return terms.unionByName(total)


def profile_drift(
    df_a: DataFrame, df_b: DataFrame, columns: list[str]
) -> DataFrame:
    """Long drift frame ``(col_name, statistic, value_a, value_b)`` for
    numeric ``columns`` over two snapshots. Values are doubles; callers
    threshold the deltas (the raw pair is returned rather than a derived
    delta so both absolute and relative alerting work downstream)."""
    one = _bundle(df_a, columns, "a").crossJoin(
        F.broadcast(_bundle(df_b, columns, "b"))
    )
    entries = []
    for c in columns:
        col_lit = c.replace("'", "\\'")
        for stat in _STATS:
            entries.append(
                "named_struct("
                f"'col_name', '{col_lit}', 'statistic', '{stat}', "
                f"'value_a', CAST(`{c}::{stat}::a` AS DOUBLE), "
                f"'value_b', CAST(`{c}::{stat}::b` AS DOUBLE))"
            )
    explode = "explode(array(" + ", ".join(entries) + ")) AS e"
    return one.select(F.expr(explode)).select("e.*")
