"""Incremental (mergeable) profiling — profile the NEW data only,
merge with stored partials, never rescan the corpus.

At 100 TB with daily ingest, re-running ``describe`` over the full
table per day is a full-corpus scan for statistics that are 99%
unchanged. This module splits the profile into the classic
partial/merge/finalize shape:

  * :func:`partial_profile` — ONE scan of a frame (typically just the
    new partition) producing one compact row per column of mergeable
    sufficient statistics: non-null count, null count, sum, mean, M2
    (centered second moment), min, max, and an HLL distinct sketch
    (``hll_sketch_agg`` — Spark's Datasketches binding, binary,
    mergeable).
  * :func:`merge_partials` — pure-aggregation merge of any number of
    partial frames (yesterday's stored partial + today's): counts and
    sums add, min/max fold, mean/M2 combine by the parallel
    (Chan et al.) formula expressed as one grouped aggregation, HLL
    sketches union register-wise (``hll_union_agg``). No source data
    touched.
  * :func:`finalize_profile` — derive the describe-compatible
    statistics (mean, sample std ddof=1, distinct estimate, p_null)
    from a partial. Cheap projection.

Contract: ``finalize_profile(merge_partials(partial(A), partial(B)))``
equals ``finalize_profile(partial(A ∪ B))`` — exactly for counts,
min/max and sum, within the sketch's own relative error for the HLL
estimate (Datasketches' union internally promotes HLL_4→HLL_8, so the
unioned estimate is equivalent-quality but not bit-identical to a
single-shot sketch; lgK=14 ⇒ ~0.8% RSE), and
to float round-off for mean/M2 (the grouped merge uses the CENTERED
Chan form ``M2 = Σm2_i + Σn_i·(mean_i − mean)²`` with the merged mean
computed first — well-conditioned even for mean ≫ spread columns,
where the one-pass König-Huygens form would cancel catastrophically;
stability over a 30-partial fold is property-tested).

Quantiles ARE covered incrementally — via Datasketches KLL
(``kll_sketch_agg_double`` / ``kll_merge_agg_double``, Spark ≥4.0):
each numeric column's partial carries a KLL sketch; merge is the
sketch merge; finalize reads the standard describe probabilities off
the merged sketch with the sketch's rank-error guarantee (default
k=200 ⇒ ~1.65% rank error at 99% confidence). EXACT quantiles remain
a batch-only property (describe's value-histogram pass).

Storage: partials are ordinary small DataFrames (one row per column)
— write them with ``sources.sinks.write_report`` next to the data they
summarize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: lgConfigK for the HLL sketches — fixed so every partial is unionable.
_HLL_LGK = 14


#: stat fields of a partial row — everything else is a grouping column.
_STAT_FIELDS = ("column", "n", "n_null", "sum", "mean", "m2",
                "min", "max", "hll", "kll")


def partial_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (group…,) column: (group…, column, n, n_null, sum,
    mean, m2, min, max, hll, kll) — the mergeable sufficient
    statistics, from ONE scan.

    Numeric columns get the full moment block; every column gets
    counts and the HLL distinct sketch (over the string rendering, so
    mixed-type evolution can't split a value's identity across
    partials). ``group_cols`` adds per-group partials (e.g. per
    ``source``) — merge/finalize handle them transparently (any
    non-stat column is part of the merge key)."""
    from petk_spark import constants
    from petk_spark.logical_types import static_logical_type
    from petk_spark.operators.describe import find_columns

    group_cols = list(group_cols or [])
    # merge_partials classifies partial columns BY NAME against
    # _STAT_FIELDS — a group column named 'n'/'mean'/'column'/… would be
    # silently aggregated as a statistic instead of joining the merge
    # key, corrupting every downstream merge. Fail fast here instead.
    clash = sorted(set(group_cols) & set(_STAT_FIELDS))
    if clash:
        raise ValueError(
            f"group_cols {clash} collide with partial-profile stat field "
            f"names {_STAT_FIELDS}; rename the grouping column(s) "
            f"(e.g. df.withColumnRenamed) before profiling"
        )
    cols = [
        c for c in find_columns(df, columns) if c not in group_cols
    ]
    fields = {f.name: f for f in df.schema.fields}
    ltypes = {c: static_logical_type(fields[c]) for c in cols}

    aggs = []
    for c in cols:
        q = f"`{c}`"
        is_num = ltypes[c] == constants.TYPE_NUM
        v = f"CAST({q} AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.expr(f"count({q})").alias("n"),
                F.expr(f"count(1) - count({q})").alias("n_null"),
                F.expr(f"sum({v})").alias("sum"),
                F.expr(f"avg({v})").alias("mean"),
                # M2 = (n-1)·var; var_samp of a single value is NULL →
                # coalesce to 0 so a 1-row partial merges cleanly
                F.expr(
                    f"CASE WHEN count({v}) > 1 THEN "
                    f"var_samp({v}) * (count({v}) - 1) "
                    f"WHEN count({v}) = 1 THEN 0.0D ELSE NULL END"
                ).alias("m2"),
                F.expr(f"min({v})").alias("min"),
                F.expr(f"max({v})").alias("max"),
                F.expr(
                    f"hll_sketch_agg(CAST({q} AS STRING), {_HLL_LGK})"
                ).alias("hll"),
                (
                    F.expr(f"kll_sketch_agg_double({v})")
                    if is_num
                    else F.expr("CAST(NULL AS BINARY)")
                ).alias("kll"),
            ).alias(f"__p_{c}")
        )
    wide = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
    return wide.select(
        *group_cols,
        F.explode(F.array(*[F.col(f"__p_{c}") for c in cols])).alias("p"),
    ).select(*group_cols, "p.*")


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Merge partial-profile frames into one — a pure aggregation over
    the concatenated partial rows; the source data is never touched.

    mean/M2 combine via the CENTERED Chan identity
    ``M2 = Σm2_i + Σ n_i·(mean_i − mean)²`` computed in two stages:
    the merged mean first (a window total over the concatenated
    partials, per merge key), then the between-chunk term against it.
    The uncentered König-Huygens form (``Σn·mean² − n·mean²``) is
    algebraically identical but cancels catastrophically when
    mean ≫ spread — at mean ~1e9 with unit spread it loses ~all
    significant digits of M2 over a 30-partial fold, where the
    centered form stays exact to round-off (pinned by the 30-day
    lifecycle property test).

    Plan / NULL-safety: the merged mean is attached as a WINDOW total
    (``partitionBy(keys)``, whole-partition frame) rather than a
    self-join of the partials frame — windows, like groupBy, hash
    NULL keys into their own group, so a grouped partial whose group
    column contains NULL merges correctly (a null-unsafe equi-join
    here silently dropped the NULL group — round-6 advisory). The
    follow-up groupBy reuses the window's hash partitioning, so the
    whole merge is ONE shuffle of the compact partials frame
    (rows = chunks × columns). HLL sketches union register-wise
    (same error bound as a single-shot sketch; not bit-identical —
    see module docstring)."""
    assert partials, "need at least one partial frame"
    allp = partials[0]
    for p in partials[1:]:
        allp = allp.unionByName(p)
    # any non-stat column (e.g. the group_cols of a grouped partial)
    # is part of the merge key
    keys = ["column"] + [
        c for c in allp.columns if c not in _STAT_FIELDS
    ]
    wk = Window.partitionBy(*[F.col(k) for k in keys])
    n_eff = F.sum(F.expr("CASE WHEN mean IS NOT NULL THEN n END")).over(wk)
    gmean = F.when(n_eff > 0, F.sum(F.expr("n * mean")).over(wk) / n_eff)
    withg = allp.withColumn("__gmean", gmean)
    return withg.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.sum("sum").alias("sum"),
        F.expr(
            "CASE WHEN sum(CASE WHEN mean IS NOT NULL THEN n END) > 0 THEN "
            "sum(n * mean) / sum(CASE WHEN mean IS NOT NULL THEN n END) END"
        ).alias("mean"),
        F.expr(
            "CASE WHEN sum(CASE WHEN m2 IS NOT NULL THEN n END) > 0 THEN "
            "sum(m2 + n * (mean - __gmean) * (mean - __gmean)) END"
        ).alias("m2"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.expr("hll_union_agg(hll)").alias("hll"),
        F.expr("kll_merge_agg_double(kll)").alias("kll"),
    ).select(
        *keys, "n", "n_null", "sum", "mean", "m2",
        "min", "max", "hll", "kll",
    )


def finalize_profile(partial: DataFrame) -> DataFrame:
    """Describe-compatible statistics from a (merged) partial: adds
    std (ddof=1), variance, p_null and the HLL distinct estimate."""
    extra = [c for c in partial.columns if c not in _STAT_FIELDS]
    return partial.select(
        *extra,
        "column",
        "n",
        "n_null",
        # try_divide: an all-empty partial (n = n_null = 0) finalizes
        # to NULL, not 0/0 = NaN — same convention as
        # streaming_completeness
        F.expr("try_divide(n_null, CAST(n + n_null AS DOUBLE))").alias("p_null"),
        "sum",
        "mean",
        F.expr("CASE WHEN n > 1 THEN m2 / (n - 1) END").alias("variance"),
        F.expr("CASE WHEN n > 1 THEN sqrt(m2 / (n - 1)) END").alias("std"),
        "min",
        "max",
        F.expr("hll_sketch_estimate(hll)").alias("distinct_estimate"),
        # guard on the sketch's item count, not NULLness: aggregating
        # an all-NULL (e.g. non-numeric) column yields a non-NULL EMPTY
        # sketch buffer, and get_quantile throws on it
        *[
            F.expr(
                f"CASE WHEN kll IS NOT NULL "
                f"AND kll_sketch_get_n_double(kll) > 0 THEN "
                f"kll_sketch_get_quantile_double(kll, {p}) END"
            ).alias(label)
            for p, label in [
                (0.05, "q05"), (0.25, "q25"), (0.5, "median"),
                (0.75, "q75"), (0.95, "q95"),
            ]
        ],
    )


def overlap_estimate(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    lgk: int = 14,
) -> DataFrame:
    """Sketch-based corpus-overlap estimate — the cheap first pass of
    train/test contamination analysis: estimate |A|, |B| and |A ∩ B|
    over ``column`` (e.g. a document fingerprint) WITHOUT a join,
    using Datasketches theta sketches (``theta_sketch_agg`` +
    ``theta_intersection``). Each side is one scan producing one
    ~2^lgk-entry sketch; the intersection is a driver-free 1-row
    combine.

    Output (1 row): ``n_a``, ``n_b``, ``n_overlap`` (estimates,
    sketch-error bounded: lgK=14 ⇒ ~0.8% RSE per sketch; intersection
    error grows when the overlap is tiny relative to the inputs —
    treat near-zero estimates as "no material contamination", then run
    ``fingerprint_overlap`` for exact row-level hits on the flagged
    pairs).

    The sketches are also the MERGEABLE partial: keep per-partition
    theta sketches next to stored profiles and union them as the
    corpus grows (``theta_union_agg``), re-estimating overlap against
    a fixed benchmark sketch without rescanning the corpus."""
    v = f"CAST(`{column}` AS STRING)"
    sk_a = df_a.agg(F.expr(f"theta_sketch_agg({v}, {lgk})").alias("sa"))
    sk_b = df_b.agg(F.expr(f"theta_sketch_agg({v}, {lgk})").alias("sb"))
    return (
        sk_a.crossJoin(F.broadcast(sk_b))
        .selectExpr(
            "theta_sketch_estimate(sa) AS n_a",
            "theta_sketch_estimate(sb) AS n_b",
            "theta_sketch_estimate(theta_intersection(sa, sb)) AS n_overlap",
        )
    )
