"""Grouped and windowed profiling (SURVEY §2.F5) + correlation (F6) +
frequent values / histograms (F7).

These reuse the describe stat-bundle philosophy — one fused aggregation
per call — but keyed by group columns or tumbling time buckets. All
expressions are built-in (JVM codegen); the only shuffle is the groupBy
on the profiling key, with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: The numeric stat bundle applied per group — a compact subset of the
#: describe() statistics that aggregates mergeably (no exact quantiles:
#: grouped profiling is a scale operator, so quantiles are approximate
#: by design; use describe() on a filtered frame for exact ones).
def _group_stats(c: Column) -> list[Column]:
    d = c.cast("double")
    return [
        F.count(c).alias("count"),
        F.avg(d).alias("mean"),
        F.stddev_samp(d).alias("std"),
        F.min(d).alias("min"),
        F.max(d).alias("max"),
        F.sum(d).alias("sum"),
    ]


def grouped_profile(
    df: DataFrame, group_cols: str | list[str], value_col: str
) -> DataFrame:
    """Per-group numeric profile: (group…, count, mean, std, min, max, sum).
    One shuffle on the group key."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    return df.groupBy(*group_cols).agg(*_group_stats(F.col(value_col)))


def grouped_quantiles(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    probs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact interpolated per-group quantiles: (group…, q05..q95).

    Uses ``F.percentile`` (linear interpolation — pandas/DuckDB
    ``quantile_cont`` identical), which describe() deliberately avoids
    table-wide because it concentrates each aggregation group on one
    reducer. HERE that hazard is the point of the operator: grouped
    quantiles shard by the GROUP key, so each reducer holds one group's
    values — safe whenever groups are bounded (the usual case for
    categorical keys), and the describe value-histogram path remains the
    tool for whole-table quantiles. One shuffle on the group key."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    aggs = [
        F.expr(
            f"percentile(CAST(`{value_col}` AS DOUBLE), {p})"
        ).alias(f"q{str(p).replace('0.', '').ljust(2, '0')}")
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def grouped_quantiles_approx(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    probs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """KLL-sketch per-group quantiles — the UNBOUNDED-group scale path.

    ``grouped_quantiles`` (exact) buffers each group's values on one
    reducer — correct and intended for bounded categorical groups, a
    hazard when a single group can hold billions of rows. This variant
    aggregates a Datasketches KLL sketch per group instead
    (``kll_sketch_agg_double``: mergeable, map-side combined, fixed
    ~O(k·log n) memory per group regardless of group size; default
    k=200 ⇒ ~1.65% rank error at 99% confidence) and reads the same
    probabilities off each group's sketch. Same output schema as the
    exact operator, so callers can switch on group-size expectations.

    The all-NULL-group guard matches incremental.finalize_profile: an
    empty sketch is a non-NULL buffer on which get_quantile throws, so
    quantiles gate on the sketch's item count."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    g = df.groupBy(*group_cols).agg(
        F.expr(
            f"kll_sketch_agg_double(CAST(`{value_col}` AS DOUBLE))"
        ).alias("__kll")
    )
    qs = [
        F.expr(
            f"CASE WHEN kll_sketch_get_n_double(__kll) > 0 THEN "
            f"kll_sketch_get_quantile_double(__kll, {p}) END"
        ).alias(f"q{str(p).replace('0.', '').ljust(2, '0')}")
        for p in probs
    ]
    return g.select(*group_cols, *qs)


def windowed_profile(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    group_cols: list[str] | None = None,
    ts_is_epoch_seconds: bool = False,
) -> DataFrame:
    """Tumbling-window numeric profile.

    The bucket is ``floor(epoch_seconds / w) * w`` — numerically
    identical in any SQL engine (oracle-safe), equivalent to
    ``F.window(ts, ...)`` for tumbling windows but cheaper: a plain
    groupBy on a derived long, no struct window column.
    """
    if ts_is_epoch_seconds:
        epoch = F.col(ts_col).cast("double")
    else:
        epoch = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(epoch / window_seconds) * window_seconds).cast("long")
    keys = [bucket.alias("window_start")] + [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*keys).agg(*_group_stats(F.col(value_col)))


# ---------------------------------------------------------------------------
# F6 — correlation matrix
# ---------------------------------------------------------------------------

def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations in ONE aggregation pass (all
    ``n*(n-1)/2`` ``corr`` expressions fused into a single scan).
    Long output (col_a, col_b, corr) with col_a < col_b."""
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    aggs = [
        F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(f"{a}::{b}")
        for a, b in pairs
    ]
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"`{a}::{b}`").alias("corr"),
        )
        for a, b in pairs
    ]
    return wide.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


# ---------------------------------------------------------------------------
# F7 — frequent values & histograms
# ---------------------------------------------------------------------------

def frequent_values(df: DataFrame, col: str, top_n: int = 10) -> DataFrame:
    """Top-n most frequent values of a column (count desc, value asc —
    deterministic). Nulls excluded (they are profiled by n_null)."""
    c = F.col(col)
    return (
        df.filter(c.isNotNull())
        .groupBy(c.cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .limit(top_n)
    )


def equidepth_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Equi-depth (quantile-bin) histogram: bucket edges are the exact
    interpolated quantiles at i/n_buckets, so each bucket holds ~equal
    mass regardless of the distribution's shape — the histogram that
    stays readable on heavy-tailed columns where equi-width piles 99%
    of rows into one bar.

    Output: (bucket, edge_lo, edge_hi, n) with bucket 1..n_buckets;
    values equal to an interior edge count DOWN (bucket = smallest i
    with value ≤ edge_i), and every row lands in a bucket (edges span
    min..max by construction).

    Plan: one edges aggregation + one bucket-count aggregation — the
    edges row is broadcast, the count shuffle carries ≤ n_buckets
    groups. The edge pass reuses describe's distributed value-histogram
    rank machinery (``_exact_value_stats``): exact interpolated
    quantiles with NO single-reducer buffering — the same float64
    interpolation expression as ``percentile``/``quantile_cont``, so
    the oracle hash is unchanged while the plan survives an unbounded
    column (the earlier ``percentile(col, array(...))`` edge pass
    buffered every value on one reducer — the pattern describe.py's
    docstring names a 100 TB non-starter)."""
    from petk_spark import constants
    from petk_spark.operators.describe import _exact_value_stats

    c = F.col(col).cast("double")
    probs = [i / n_buckets for i in range(n_buckets + 1)]
    edges = _exact_value_stats(
        df, [col], {col: constants.TYPE_NUM}, probs=probs, moments=False
    ).selectExpr(f"`{col}::quantiles` AS __edges")
    # bucket = 1 + #edges strictly below the value, over interior edges
    bucket = F.lit(1) + F.aggregate(
        F.slice(F.col("__edges"), 2, n_buckets - 1),
        F.lit(0),
        lambda acc, e: acc + F.when(c > e, 1).otherwise(0),
    )
    counts = (
        df.filter(c.isNotNull())
        .crossJoin(F.broadcast(edges))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(edges))
        .select(
            "bucket",
            F.element_at("__edges", F.col("bucket").cast("int")).alias("edge_lo"),
            F.element_at("__edges", (F.col("bucket") + 1).cast("int")).alias(
                "edge_hi"
            ),
            "n",
        )
        .orderBy("bucket")
    )


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_buckets: int = 10
) -> DataFrame:
    """Equi-width histogram (bucket 0 = below lo, n_buckets+1 = above hi
    — SQL width_bucket semantics, but computed with an explicit floor
    expression so the arithmetic is engine-identical for the oracle).
    Single shuffle on the bucket id; bounds are explicit so the operator
    needs no pre-pass (at scale, feed min/max from describe())."""
    c = F.col(col).cast("double")
    w = (hi - lo) / n_buckets
    b = (
        F.when(c < F.lit(float(lo)), F.lit(0))
        .when(c >= F.lit(float(hi)), F.lit(n_buckets + 1))
        .otherwise(F.floor((c - F.lit(float(lo))) / F.lit(w)) + 1)
        .cast("long")
    )
    return (
        df.filter(c.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "bucket_lo",
            F.lit(float(lo)) + (F.col("bucket") - 1) * F.lit((hi - lo) / n_buckets),
        )
        .orderBy("bucket")
    )
