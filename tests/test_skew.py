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
