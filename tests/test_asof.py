"""asof_join semantics pins: inclusive same-instant match, greatest-ord
tie-break among equal-time right rows, LEFT OUTER nulls, and the
no-join-node plan shape (the operator's whole point is ONE shuffle +
window instead of a range join)."""

from __future__ import annotations

from petk_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, t double, lid long")
    right = spark.createDataFrame(right_rows, "k long, rt double, rid long")
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt",
        right_cols=["rid", "rt"], right_ord="rid",
    )
    return {r.lid: (r.rid, r.rt) for r in out.collect()}


def test_basic_latest_at_or_before(spark):
    got = _run(
        spark,
        [(1, 10.0, 100), (1, 20.0, 101), (1, 5.0, 102)],
        [(1, 8.0, 1), (1, 15.0, 2), (1, 25.0, 3)],
    )
    assert got[100] == (1, 8.0)     # 8 <= 10 < 15
    assert got[101] == (2, 15.0)    # 15 <= 20 < 25
    assert got[102] == (None, None)  # before first right row


def test_same_instant_is_inclusive_and_ties_resolve_to_greatest_ord(spark):
    got = _run(
        spark,
        [(1, 10.0, 100)],
        [(1, 10.0, 7), (1, 10.0, 9), (1, 3.0, 1)],
    )
    # a right row AT the left timestamp matches; among equal-time right
    # rows the greatest right_ord wins.
    assert got[100] == (9, 10.0)


def test_keys_do_not_leak_across_partitions(spark):
    got = _run(
        spark,
        [(1, 10.0, 100), (2, 10.0, 200)],
        [(1, 5.0, 1)],
    )
    assert got[100] == (1, 5.0)
    assert got[200] == (None, None)


def test_plan_has_no_join_node(spark):
    from petk_spark.plans.inspect import exchange_count, executed_plan

    left = spark.createDataFrame([(1, 1.0, 1)], "k long, t double, lid long")
    right = spark.createDataFrame([(1, 1.0, 2)], "k long, rt double, rid long")
    out = asof_join(left, right, "k", "t", "rt", ["rid"], "rid")
    plan = executed_plan(out)
    assert "Join" not in plan, "as-of must be union+window, not a join"
    assert exchange_count(out) == 1  # one hash shuffle on the key

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=15
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=0, max_size=15
    ),
)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    """Adversarial anchor: asof_join must agree with pandas
    merge_asof(by=key, direction='backward', allow_exact_matches=True)
    — the de-facto reference semantics — on random small frames,
    including duplicate timestamps on both sides. pandas breaks
    equal-time right ties by taking the LAST input row; feeding it
    right rows sorted by (t, rid) makes that the greatest-rid rule the
    operator pins."""
    import pandas as pd

    left = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(lrows)],
        "k long, t double, lid long",
    )
    right = spark.createDataFrame(
        [(k, float(t), 1000 + i) for i, (k, t) in enumerate(rrows)],
        "k long, rt double, rid long",
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt",
        right_cols=["rid"], right_ord="rid",
    )
    got = {r.lid: r.rid for r in out.collect()}

    lp = pd.DataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(lrows)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = (
        pd.DataFrame(
            [(k, float(t), 1000 + i) for i, (k, t) in enumerate(rrows)],
            columns=["k", "t", "rid"],
        )
        .astype({"k": "int64", "t": "float64", "rid": "int64"})
        .sort_values(["t", "rid"], kind="stable")
    )
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want
