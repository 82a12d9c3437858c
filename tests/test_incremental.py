"""Incremental profiling: finalize(merge(partial(A), partial(B), ...))
must equal finalize(partial(A ∪ B)) — exactly for counts/min/max and
within the sketch's error for the HLL distinct estimate, and to float
round-off for sum/mean/M2."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from petk_spark.operators.incremental import (
    finalize_profile,
    merge_partials,
    partial_profile,
)

SF = "/root/testdata/sf0.001"
COLS = ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"]


def _rows(df):
    return {r["column"]: r.asDict() for r in df.collect()}


@pytest.fixture(scope="module")
def split_vs_whole(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    chunks = [df.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
    merged = finalize_profile(
        merge_partials(*[partial_profile(c, COLS) for c in chunks])
    )
    direct = finalize_profile(partial_profile(df, COLS))
    return _rows(merged), _rows(direct)


def test_counts_min_max_exact(split_vs_whole):
    got, want = split_vs_whole
    for c in COLS:
        for k in ("n", "n_null", "min", "max"):
            assert got[c][k] == want[c][k], (c, k, got[c][k], want[c][k])


def test_hll_union_estimate_within_sketch_error(split_vs_whole):
    # Datasketches' union is equivalent-quality but not bit-identical
    # to a single-shot sketch (HLL_4->HLL_8 promotion); lgK=14 => ~0.8%
    # RSE, assert within 3 sigma of the single-shot estimate
    got, want = split_vs_whole
    for c in COLS:
        g, w = got[c]["distinct_estimate"], want[c]["distinct_estimate"]
        assert abs(g - w) <= max(0.025 * w, 2.0), (c, g, w)


def test_moments_match_to_roundoff(split_vs_whole):
    got, want = split_vs_whole
    for c in ["l_orderkey", "l_quantity", "l_extendedprice"]:
        for k in ("sum", "mean", "variance", "std", "p_null"):
            g, w = got[c][k], want[c][k]
            assert g is not None and w is not None, (c, k)
            assert math.isclose(g, w, rel_tol=1e-9), (c, k, g, w)


def test_hll_estimate_tracks_exact_distinct(spark, split_vs_whole):
    got, _ = split_vs_whole
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    for c in COLS:
        exact = df.select(c).distinct().count()
        est = got[c]["distinct_estimate"]
        assert abs(est - exact) <= max(0.05 * exact, 2.0), (c, est, exact)


def test_all_null_and_single_row_chunks_merge_cleanly(spark):
    a = spark.createDataFrame([(None,), (None,)], "x double")
    b = spark.createDataFrame([(5.0,)], "x double")
    c = spark.createDataFrame([(7.0,), (9.0,)], "x double")
    out = _rows(
        finalize_profile(
            merge_partials(*[partial_profile(d, ["x"]) for d in (a, b, c)])
        )
    )["x"]
    assert out["n"] == 3 and out["n_null"] == 2
    assert out["min"] == 5.0 and out["max"] == 9.0
    assert math.isclose(out["mean"], 7.0)
    assert math.isclose(out["variance"], 4.0)  # var_samp of {5,7,9}
    assert math.isclose(out["p_null"], 0.4)


def test_kll_merged_quantiles_within_rank_error(spark, split_vs_whole):
    """Merged KLL quantiles must sit within the sketch's rank error of
    the EXACT quantiles (k=200 => ~1.65% rank error at 99% conf; assert
    at a generous 3% rank band via exact percentiles at p±0.03)."""
    got, _ = split_vs_whole
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    for c in ["l_quantity", "l_extendedprice"]:
        for p, label in [(0.05, "q05"), (0.25, "q25"), (0.5, "median"),
                         (0.75, "q75"), (0.95, "q95")]:
            lo, hi = df.selectExpr(
                f"percentile({c}, {max(p - 0.03, 0.0)}) AS lo",
                f"percentile({c}, {min(p + 0.03, 1.0)}) AS hi",
            ).collect()[0]
            v = got[c][label]
            assert v is not None and lo <= v <= hi, (c, label, v, lo, hi)


def test_kll_absent_for_non_numeric(split_vs_whole):
    got, _ = split_vs_whole
    assert got["l_returnflag"]["median"] is None
    assert got["l_quantity"]["median"] is not None


def test_theta_overlap_estimate_tracks_exact(spark):
    """Theta-sketch overlap vs the exact distinct intersection on two
    overlapping document-id sets."""
    from petk_spark.operators.incremental import overlap_estimate

    a = spark.range(0, 4000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    row = overlap_estimate(a, b, "k").collect()[0]
    assert abs(row["n_a"] - 4000) <= 0.03 * 4000
    assert abs(row["n_b"] - 6000) <= 0.03 * 6000
    assert abs(row["n_overlap"] - 1000) <= 0.08 * 1000 + 5

    disjoint = overlap_estimate(
        a, spark.range(50000, 51000).select(F.col("id").alias("k")), "k"
    ).collect()[0]
    assert disjoint["n_overlap"] <= 5


def test_grouped_quantiles_approx_within_rank_error(spark):
    """KLL per-group quantiles track the exact per-group percentiles
    within the sketch's rank band (3% of the group's value range by
    rank, probed via exact percentiles at p±0.03)."""
    from petk_spark.operators.grouped import (
        grouped_quantiles,
        grouped_quantiles_approx,
    )

    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    approx = {
        r["l_returnflag"]: r.asDict()
        for r in grouped_quantiles_approx(df, "l_returnflag", "l_extendedprice").collect()
    }
    for flag in approx:
        for p, label in [(0.05, "q05"), (0.25, "q25"), (0.5, "q50"),
                         (0.75, "q75"), (0.95, "q95")]:
            lo, hi = df.where(F.col("l_returnflag") == flag).selectExpr(
                f"percentile(l_extendedprice, {max(p - 0.03, 0.0)}) AS lo",
                f"percentile(l_extendedprice, {min(p + 0.03, 1.0)}) AS hi",
            ).collect()[0]
            v = approx[flag][label]
            assert v is not None and lo <= v <= hi, (flag, label, v, lo, hi)

    # schema parity with the exact operator
    exact_cols = grouped_quantiles(df, "l_returnflag", "l_extendedprice").columns
    approx_cols = grouped_quantiles_approx(df, "l_returnflag", "l_extendedprice").columns
    assert exact_cols == approx_cols


def test_grouped_quantiles_approx_all_null_group(spark):
    from petk_spark.operators.grouped import grouped_quantiles_approx

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None)], "g string, x double"
    )
    rows = {r["g"]: r.asDict() for r in grouped_quantiles_approx(df, "g", "x").collect()}
    assert rows["b"]["q50"] is None
    assert rows["a"]["q50"] is not None


def test_partial_profile_parquet_round_trip_then_merge(spark, tmp_path):
    """The documented storage workflow: write yesterday's partial to
    parquet, read it back, merge with today's — the binary HLL/KLL
    sketch columns must survive the round-trip bit-exactly."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    yesterday = df.where(F.col("l_orderkey") % 2 == 0)
    today = df.where(F.col("l_orderkey") % 2 == 1)

    p = str(tmp_path / "partial_y")
    partial_profile(yesterday, COLS).write.parquet(p)
    stored = spark.read.parquet(p)

    merged = finalize_profile(
        merge_partials(stored, partial_profile(today, COLS))
    )
    direct = finalize_profile(partial_profile(df, COLS))
    got, want = _rows(merged), _rows(direct)
    for c in COLS:
        for k in ("n", "n_null", "min", "max"):
            assert got[c][k] == want[c][k], (c, k)
        assert abs(got[c]["distinct_estimate"] - want[c]["distinct_estimate"]) \
            <= max(0.025 * want[c]["distinct_estimate"], 2.0), c
    for k in ("mean", "std"):
        assert math.isclose(got["l_quantity"][k], want["l_quantity"][k],
                            rel_tol=1e-9), k
    assert got["l_quantity"]["median"] is not None


def test_grouped_partials_merge_per_group(spark):
    """Per-group partials (group_cols) merge on (group, column) and
    finalize carries the group columns through."""
    df = spark.read.parquet(f"{SF}/documents.parquet")
    a = df.where(F.col("doc_id") % 2 == 0)
    b = df.where(F.col("doc_id") % 2 == 1)
    merged = finalize_profile(
        merge_partials(
            partial_profile(a, ["n_chars"], group_cols=["source"]),
            partial_profile(b, ["n_chars"], group_cols=["source"]),
        )
    )
    direct = finalize_profile(
        partial_profile(df, ["n_chars"], group_cols=["source"])
    )
    got = {(r["source"], r["column"]): r.asDict() for r in merged.collect()}
    want = {(r["source"], r["column"]): r.asDict() for r in direct.collect()}
    assert set(got) == set(want) and len(got) >= 2
    for k in got:
        for stat in ("n", "n_null", "min", "max"):
            assert got[k][stat] == want[k][stat], (k, stat)
        assert math.isclose(got[k]["mean"], want[k]["mean"], rel_tol=1e-9), k


# ---------------------------------------------------------------------------
# 30-day lifecycle fold (VERDICT r4 #7): numerical stability of the
# centered Chan merge + KLL error bound over a realistic daily cadence
# ---------------------------------------------------------------------------

def _day_frame(spark, d: int, n: int = 400):
    """One simulated day: a hostile mean ≫ spread column (~1e9 ± ~50 —
    the regime where an uncentered König-Huygens merge loses every
    significant digit of M2), a well-scaled column, and a key with
    cross-day overlap for the HLL union."""
    rows = [
        (
            1.0e9 + ((i * 37 + d * 11) % 100),
            float((i * 13 + d) % 1000),
            (d * n + i) % (15 * n),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "big double, v double, k long")


def test_thirty_partial_fold_stable_and_within_bounds(spark):
    import statistics

    from pyspark.sql import functions as F

    days = 30
    frames = [_day_frame(spark, d) for d in range(days)]

    # the lifecycle shape: fold one day at a time into the stored
    # partial (collect+recreate each step simulates the parquet store,
    # keeping every merge a 2-frame merge like production)
    acc = partial_profile(frames[0])
    for f in frames[1:]:
        merged = merge_partials(acc, partial_profile(f))
        acc = spark.createDataFrame(merged.collect(), merged.schema)
    got = {r["column"]: r.asDict() for r in finalize_profile(acc).collect()}

    whole = frames[0]
    for f in frames[1:]:
        whole = whole.unionAll(f)
    pdf = whole.toPandas()

    for c in ("big", "v"):
        vals = list(pdf[c])
        want_mean = statistics.fmean(vals)
        want_var = statistics.variance(vals)
        assert got[c]["n"] == len(vals)
        # centered Chan merge: exact to round-off even at mean 1e9
        # with spread ~30 (rel var tolerance 1e-9; the uncentered form
        # was off by >10% here)
        assert abs(got[c]["mean"] - want_mean) <= 1e-6 * abs(want_mean)
        assert abs(got[c]["variance"] - want_var) <= 1e-9 * want_var, (
            c, got[c]["variance"], want_var,
        )
        assert got[c]["min"] == min(vals) and got[c]["max"] == max(vals)

    # HLL distinct over the 30-day union (true 6000 distinct k values,
    # far under 2^14 registers: near-exact regime, assert 2%)
    true_k = pdf["k"].nunique()
    assert abs(got["k"]["distinct_estimate"] - true_k) <= 0.02 * true_k

    # merged KLL quantiles: rank of each reported quantile within the
    # sketch's guarantee (k=200 => ~1.65% @99%; assert 3%)
    svals = sorted(pdf["v"])
    n = len(svals)
    import bisect

    for p, lbl in [(0.05, "q05"), (0.25, "q25"), (0.5, "median"),
                   (0.75, "q75"), (0.95, "q95")]:
        q = got["v"][lbl]
        r_lo = bisect.bisect_left(svals, q) / n
        r_hi = bisect.bisect_right(svals, q) / n
        assert r_lo - 0.03 <= p <= r_hi + 0.03, (lbl, q, r_lo, r_hi)


def test_group_col_stat_name_collision_raises(spark):
    """A grouping column named like a partial stat field would be
    silently aggregated as a statistic by merge_partials — partial_profile
    must refuse it up front (advisory fix, round 5)."""
    df = spark.createDataFrame([(1, 1.0)], "n long, v double")
    with pytest.raises(ValueError, match="collide"):
        partial_profile(df, ["v"], group_cols=["n"])


def test_empty_partial_finalizes_p_null_to_null_not_nan(spark):
    """n = n_null = 0 (empty frame) must finalize p_null as NULL, not
    0/0 = NaN (try_divide convention, advisory fix round 5)."""
    df = spark.createDataFrame([], "v double")
    row = finalize_profile(partial_profile(df, ["v"])).collect()[0]
    assert row["n"] == 0 and row["n_null"] == 0
    assert row["p_null"] is None


def test_grouped_partials_merge_keeps_null_group(spark):
    """A grouped partial whose group column contains NULL must keep the
    NULL group through the merge — groupBy/windows hash NULL keys into
    their own group, and the centered-Chan stage now attaches the
    merged mean via a window instead of a null-unsafe equi-join, which
    silently dropped the NULL group (round-6 advisory)."""
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
                F.col("source")
            ),
        )
    )
    a = df.where(F.col("doc_id") % 2 == 0)
    b = df.where(F.col("doc_id") % 2 == 1)
    merged = finalize_profile(
        merge_partials(
            partial_profile(a, ["n_chars"], group_cols=["source"]),
            partial_profile(b, ["n_chars"], group_cols=["source"]),
        )
    )
    direct = finalize_profile(
        partial_profile(df, ["n_chars"], group_cols=["source"])
    )
    got = {(r["source"], r["column"]): r.asDict() for r in merged.collect()}
    want = {(r["source"], r["column"]): r.asDict() for r in direct.collect()}
    assert set(got) == set(want)
    assert any(k[0] is None for k in got), "NULL group missing from merge"
    for k in got:
        for stat in ("n", "n_null", "min", "max"):
            assert got[k][stat] == want[k][stat], (k, stat)
        assert math.isclose(got[k]["mean"], want[k]["mean"], rel_tol=1e-9), k
        if want[k]["variance"] is not None:
            assert math.isclose(
                got[k]["variance"], want[k]["variance"],
                rel_tol=1e-6, abs_tol=1e-9,
            ), k
