"""Property-based profile invariants (SURVEY §5.4).

hypothesis generates adversarial numeric/string columns; invariants are
checked on the full fused describe pass. Uses one shared SparkSession
and small data (invariants are data-size-independent)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from petk_spark.operators.describe import describe_frame

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)
opt_double = st.one_of(st.none(), finite_doubles)


def _stats(spark, values, dtype="double"):
    df = spark.createDataFrame([(v,) for v in values], f"x {dtype}")
    rows = describe_frame(df, ["x"], exact=True, include_mad=True).collect()
    return {r["statistic"]: (r["value_num"], r["value_str"]) for r in rows}


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(opt_double, min_size=1, max_size=40))
def test_numeric_profile_invariants(spark, vals):
    s = _stats(spark, vals)
    n = len(vals)
    cnt = s["count"][0]
    n_null = s["n_null"][0]

    assert cnt + n_null == n                      # C3+C5 partition rows
    assert 0.0 <= s["p_null"][0] <= 1.0
    assert s["distinct_count"][0] <= max(cnt, 0) + 0  # nulls excluded
    if s["is_constant"][0] == 1.0:
        assert s["distinct_count"][0] <= 1
    if cnt:
        q = [s[k][0] for k in ["min", "5%", "25%", "50%", "75%", "95%", "max"]]
        assert all(a <= b + 1e-9 for a, b in zip(q, q[1:]))  # monotone quantiles
        assert s["min"][0] <= s["mean"][0] <= s["max"][0]
    if cnt and cnt > 1 and s["std"][0] is not None:
        assert s["std"][0] >= 0
        assert math.isclose(
            s["variance"][0], s["std"][0] ** 2, rel_tol=1e-6, abs_tol=1e-9
        )


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(opt_double, min_size=2, max_size=30), seed=st.integers(0, 2**31))
def test_permutation_invariance(spark, vals, seed):
    """Permuting rows changes no statistic (SURVEY §5.4 metamorphic) —
    up to float-summation order error. Catastrophic cancellation (e.g.
    [2.00001, 1e12, -1e12]) makes any order-based sum differ by
    ~n·eps·max|x| in ABSOLUTE terms, which can be enormous relative to
    the cancelled result; pandas has the identical property. So the
    bound is threefold: a base rel_tol, the standard absolute summation
    error bound, and — for the sum-derived statistics — a CONDITION-
    NUMBER-aware relative bound n·κ·eps with κ = Σ|x| / |Σx| (the
    classic summation condition number): when the sum is cancellation-
    dominated, ANY order-based engine (pandas included) loses exactly
    that many digits, and the test must not demand them back."""
    import random

    shuffled = list(vals)
    random.Random(seed).shuffle(shuffled)
    a, b = _stats(spark, vals), _stats(spark, shuffled)
    present = [v for v in vals if v is not None]
    scale = max((abs(v) for v in present), default=0.0)
    n = len(vals)
    eps = 2.0 ** -52
    sum_err = 64 * n * 2.3e-16 * max(scale, scale * scale)
    sum_abs = sum(abs(v) for v in present)
    sum_x = abs(math.fsum(present))
    kappa = sum_abs / sum_x if sum_x > 0 else float("inf")
    cond_rel = min(64 * n * eps * kappa, 1.0)
    # Statistics whose value is a (ratio of) order-dependent float sums;
    # rank/count-based statistics stay at the strict base tolerance.
    order_sensitive = {"mean", "sum", "std", "variance", "skewness",
                       "kurtosis", "mad", "cv"}
    for k in a:
        va, vb = a[k][0], b[k][0]
        if va is None or vb is None:
            if va is not vb and k in order_sensitive and kappa > 1e9:
                # Ill-conditioned column: the engine's pinned noise-floor
                # guards (e.g. cv's subnormal-mean NULL) may sit within
                # the summation noise of the threshold itself.
                continue
            assert va == vb, k
        else:
            rel = max(1e-9, cond_rel) if k in order_sensitive else 1e-9
            assert math.isclose(va, vb, rel_tol=rel, abs_tol=max(1e-12, sum_err)), k


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(finite_doubles, min_size=1, max_size=30))
def test_appending_null_only_touches_null_stats(spark, vals):
    """Appending a null changes only size-derived stats (§5.4)."""
    a = _stats(spark, vals)
    b = _stats(spark, vals + [None])
    unchanged = ["count", "distinct_count", "min", "max", "mean", "std",
                 "sum", "5%", "25%", "50%", "75%", "95%"]
    for k in unchanged:
        va, vb = a[k][0], b[k][0]
        if va is None or vb is None:
            assert va == vb, k
        else:
            assert math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12), k
    assert b["n_null"][0] == a["n_null"][0] + 1


def test_exact_quantiles_edge_values(spark):
    """The bucketed rank path must survive the values that break naive
    range bucketing: infinities (own buckets), an outlier stretching the
    finite range 18 orders of magnitude, a dense sub-ulp cluster, and
    negatives. Expected values are numpy's linear-interpolation
    quantiles over the same data (pandas semantics, NaN-free input)."""
    import numpy as np

    vals = (
        [float("-inf"), float("inf")]
        + [-1e18, 1e18]
        + [1.0 + i * 1e-9 for i in range(20)]
        + [-5.0, -4.0, 0.0, 3.0, 7.5]
    )
    s = _stats(spark, vals)
    arr = np.array(vals, dtype=np.float64)
    for p, label in [(0.05, "5%"), (0.25, "25%"), (0.5, "50%"),
                     (0.75, "75%"), (0.95, "95%")]:
        expect = float(np.quantile(arr, p))
        got = s[label][0]
        if math.isinf(expect):
            assert got == expect, (label, got, expect)
        else:
            assert math.isclose(got, expect, rel_tol=1e-12), (label, got, expect)
    assert s["distinct_count"][0] == len(set(vals))
