"""Skew torture for the LSH bucket joins (SCALE.md hazard #3): one HOT
near-duplicate cluster puts every cluster member into the same band
bucket, so the bucket self-join concentrates an O(m²) candidate blowup
on the reducer that owns that bucket's hash partition. The 100 TB
mitigation is AQE skew-join splitting; this file proves it with plan
evidence instead of a configuration claim (test B), and pins result
correctness under a hot cluster (test A)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _corpus(spark, hot: int, background: int, base_tokens: int = 40):
    """`hot` near-identical variants of one template (pairwise 3-gram
    jaccard ≈ (base-3)/(base+1) — ≈0.90 at 40 tokens) + `background`
    mutually-dissimilar docs."""
    base = " ".join(f"tok{i:03d}" for i in range(base_tokens))
    rows = [(i, f"{base} variant{i:04d}") for i in range(hot)]
    rows += [
        (hot + j, " ".join(f"bg{j:04d}w{t}" for t in range(12)))
        for j in range(background)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_lsh_hot_cluster_result_correct(spark):
    """Correctness under a hot cluster: the LSH+verify pipeline finds
    exactly the pairs exact Jaccard finds (verification makes precision
    1.0; at pair similarity ~0.90 with b=16/r=4 the S-curve miss
    probability is ~3e-8, so set equality — not overlap — is the right
    assert), and the hot cluster contributes its full C(m,2) pair set."""
    from petk_spark.operators.dedup import jaccard_near_dup, minhash_lsh_near_dup

    df = _corpus(spark, hot=60, background=400)
    lsh_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_near_dup(df, "doc_id", "text", threshold=0.8).collect()
    }
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in jaccard_near_dup(df, "doc_id", "text", threshold=0.8).collect()
    }
    assert lsh_pairs == exact_pairs
    assert len(lsh_pairs) == 60 * 59 // 2


@pytest.mark.slow
def test_lsh_hot_bucket_triggers_aqe_skew_split(spark):
    """Plan evidence that AQE splits the hot bucket's shuffle partition.

    A hot cluster of 800 docs puts 800 rows under ONE bucket key per
    band; with 64 shuffle partitions the partition owning a hot key
    carries ~4× the median bytes. AQE's OptimizeSkewedJoin must split
    it (the final adaptive plan annotates the join `skew=true`) — the
    same rule, at its DEFAULT thresholds, splits the hot partition of a
    real 100 TB corpus; only the byte thresholds are scaled down to
    test-data size here, never the mechanism. Candidates-only mode
    (verify_exact=False): the assert is on candidate COUNT — collecting
    the C(800,2) pair list would test the driver, not the join."""
    from petk_spark.operators.dedup import minhash_lsh_near_dup
    from petk_spark.plans.inspect import executed_plan

    hot, background = 800, 400
    df = _corpus(spark, hot=hot, background=background)

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.shuffle.partitions",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", "64")

        cand = minhash_lsh_near_dup(
            df, "doc_id", "text", threshold=0.8, verify_exact=False
        )
        # collect() (not count()) so the action runs through THIS
        # Dataset's own QueryExecution — executed_plan(cand) below must
        # show the FINAL adaptive plan of the run we assert about.
        # C(800,2) id-pairs ≈ 5 MB, safely collectable.
        n = len(cand.collect())

        # All C(hot,2) pairs share every band bucket; background docs
        # are singleton-bucketed (a cross-cluster band collision needs 4
        # equal minhashes — odds ~1e-9 per pair, so a small slack).
        expect = hot * (hot - 1) // 2
        assert expect <= n <= expect + 50, n

        plan = executed_plan(cand)
        assert "skew=true" in plan, "AQE skew-join split did not fire"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


# ---------------------------------------------------------------------------
# Sessionization skew: the bot-user fixture (VERDICT r4 #6)
# ---------------------------------------------------------------------------

def _bot_events(spark, n_users: int = 40, n_normal: int = 60, n_bot: int = 700):
    """Event stream where user 0 ("the bot") owns ~10%+ of all events:
    normal users emit `n_normal` events at jittered ~10-min cadence
    (sessions split at the 30-min gap), the bot emits `n_bot` events at
    a dense cadence with periodic long gaps."""
    rows = []
    for u in range(1, n_users):
        t = 1_000_000.0 + u * 17
        for i in range(n_normal):
            # deterministic jitter; every 11th step opens a session gap
            t += 2400.0 if i % 11 == 10 else 300.0 + (i * 7 + u) % 200
            rows.append((u, t))
    t = 1_000_000.0
    for i in range(n_bot):
        t += 5000.0 if i % 97 == 96 else 20.0 + (i * 13) % 40
        rows.append((0, t))
    return spark.createDataFrame(rows, "user_id long, ts double")


def test_chunked_sessionize_equals_plain_under_bot_skew(spark):
    """The two-phase (time-chunk salted) sessionize is row-identical to
    the single-window path on the bot fixture, across chunk widths both
    narrower and wider than the gap (narrow chunks exercise
    empty-chunk stitching; the 1e9-wide chunk degenerates to one chunk
    per user, i.e. the plain path itself)."""
    from petk_spark.operators.sessions import sessionize

    df = _bot_events(spark)
    want = sorted(
        map(tuple, sessionize(df, "user_id", "ts", 1800.0).collect())
    )
    for chunk in (600.0, 1800.0, 7200.0, 1e9):
        got = sorted(
            map(
                tuple,
                sessionize(
                    df, "user_id", "ts", 1800.0, chunk_seconds=chunk
                ).collect(),
            )
        )
        assert got == want, f"chunk={chunk}"


def test_chunked_sessionize_bounds_window_partitions(spark):
    """Plan + data evidence for the skew bound: the heavy window
    partitions by (user, chunk) — NOT by user alone — and on the bot
    fixture the largest (user, chunk) group is a small fraction of the
    bot's total events. AQE cannot split window partitions (it only
    splits join shuffles), so this key-design bound IS the mitigation."""
    from pyspark.sql import functions as F

    from petk_spark.operators.sessions import sessionize
    from petk_spark.plans.inspect import executed_plan

    df = _bot_events(spark)
    out = sessionize(df, "user_id", "ts", 1800.0, chunk_seconds=3600.0)
    out.collect()
    plan = executed_plan(out)
    import re

    # formatted-plan Window row: Arguments: [...], [<partition spec>],
    # [<order spec>] — the event-level gap window must partition by
    # (user_id, __chunk) and order by ts
    assert re.search(
        r"\[user_id#\d+L?, __chunk#\d+L?\], \[ts#\d+", plan
    ), plan[:2000]

    bot_total = df.filter(F.col("user_id") == 0).count()
    biggest = (
        df.groupBy(
            "user_id", F.floor(F.col("ts") / 3600.0).alias("c")
        ).count().agg(F.max("count")).collect()[0][0]
    )
    assert bot_total >= 600
    assert biggest <= bot_total / 4, (biggest, bot_total)


@pytest.mark.slow
def test_chunked_sessionize_equivalence_property(spark):
    """Hypothesis: on RANDOM event streams (duplicate timestamps,
    boundary-exact gaps, sparse users, sub-second jitter), the chunked
    plan's output is row-identical to the plain window for arbitrary
    chunk widths."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from petk_spark.operators.sessions import sessionize

    ts_strategy = st.lists(
        st.tuples(
            # user key, NULL included (round-6 advisory: the chunked
            # join back must be null-safe on the user key)
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
            st.floats(min_value=0, max_value=20_000,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=60,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=ts_strategy,
        gap=st.sampled_from([1.0, 300.0, 1800.0]),
        chunk=st.sampled_from([7.0, 250.0, 1800.0, 50_000.0]),
    )
    def check(rows, gap, chunk):
        from collections import Counter

        df = spark.createDataFrame(
            [(u, float(t)) for u, t in rows], "user_id long, ts double"
        )
        # multiset compare — NULL user keys don't sort against ints
        want = Counter(map(tuple, sessionize(df, "user_id", "ts", gap).collect()))
        got = Counter(
            map(
                tuple,
                sessionize(
                    df, "user_id", "ts", gap, chunk_seconds=chunk
                ).collect(),
            )
        )
        assert got == want

    check()


def test_chunked_sessionize_keeps_null_users(spark):
    """Rows with a NULL user key: windows and groupBy hash NULL into
    its own group, so the plain path sessionizes the NULL-user
    partition like any other user; the chunked path's join back is
    null-safe on the user key (round-6 advisory: a null-unsafe
    equi-join silently dropped those rows, breaking the documented
    row-identical equivalence)."""
    from collections import Counter

    from petk_spark.operators.sessions import sessionize

    rows = [
        (None, 100.0), (None, 200.0), (None, 5000.0), (None, 5100.0),
        (1, 100.0), (1, 200.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts double")
    plain = Counter(
        map(tuple, sessionize(df, "user_id", "ts", 1800.0).collect())
    )
    assert sum(plain.values()) == 6
    # NULL user forms two sessions (gap 5000-200 > 1800)
    assert {(u, s) for u, _, s in plain if u is None} == {
        (None, 1), (None, 2)
    }
    for chunk in (60.0, 1800.0, 1e9):
        got = Counter(
            map(
                tuple,
                sessionize(
                    df, "user_id", "ts", 1800.0, chunk_seconds=chunk
                ).collect(),
            )
        )
        assert got == plain, f"chunk={chunk}"
