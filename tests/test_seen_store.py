"""Bucketed seen-store lifecycle for incremental dedup (round 14 —
r13 verdict #1): build → filter → append keeps the daily
``filter_previously_seen`` run O(new batch): the store side of the
anti-join reads co-located buckets (no Exchange, no re-distinct);
uniqueness is maintained at append time.

Reference parity note: the reference engine has no incremental store
(eager in-memory pandas, /root/reference/petk); this is part of the
declared beyond-reference training-pipeline surface (SURVEY §2 F45).
"""

from __future__ import annotations

import os
import sys
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petk_spark.operators.dedup import (
    append_seen,
    build_seen_store,
    filter_previously_seen,
)
from petk_spark.operators.text import fingerprint_frame


@pytest.fixture()
def store(spark):
    name = f"seen_store_{uuid.uuid4().hex[:10]}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_lifecycle_build_filter_append(spark, store):
    day0 = _docs(spark, [
        (1, "alpha doc"), (2, "beta doc"), (3, "Alpha   DOC"),  # dup of 1
        (4, None),
    ])
    build_seen_store(day0, "id", "text", store, n_buckets=4)
    # store is distinct and null-free
    fps = spark.table(store)
    assert fps.columns == ["fingerprint"]
    assert fps.count() == 2
    assert fps.where(F.col("fingerprint").isNull()).count() == 0

    day1 = _docs(spark, [
        (10, "ALPHA doc"),          # seen on day 0 → dropped
        (11, "gamma doc"),          # new → kept
        (12, "gamma doc"),          # within-batch dup → KEPT (contract)
        (13, None),                 # NULL → KEPT (no comparison basis)
    ])
    kept = filter_previously_seen(day1, "id", "text", store_table=store)
    assert sorted(r["id"] for r in kept.collect()) == [11, 12, 13]
    # store tier ≡ frame tier on the same data
    frame_kept = filter_previously_seen(
        day1, "id", "text",
        seen=fingerprint_frame(day0, "id", "text"),
    )
    assert sorted(r["id"] for r in frame_kept.collect()) == [11, 12, 13]

    append_seen(day1, "id", "text", store, n_buckets=4)
    # day 2: everything from day 0 AND day 1 is now seen
    day2 = _docs(spark, [
        (20, "gamma   doc"), (21, "beta doc"), (22, "delta doc"),
    ])
    kept2 = filter_previously_seen(day2, "id", "text", store_table=store)
    assert sorted(r["id"] for r in kept2.collect()) == [22]


def test_append_maintains_uniqueness(spark, store):
    day0 = _docs(spark, [(1, "a"), (2, "b")])
    build_seen_store(day0, "id", "text", store, n_buckets=4)
    # append the SAME batch twice plus an overlap — no dup rows land
    day1 = _docs(spark, [(3, "a"), (4, "c"), (5, "C")])
    append_seen(day1, "id", "text", store, n_buckets=4)
    append_seen(day1, "id", "text", store, n_buckets=4)
    fps = [r["fingerprint"] for r in spark.table(store).collect()]
    assert len(fps) == len(set(fps)) == 3       # a, b, c


def test_store_side_reads_buckets_no_exchange(spark, store):
    """THE scale contract: with broadcast off (forcing the join shape
    a corpus-scale store takes), the anti-join plan contains exactly
    one shuffle Exchange — the NEW batch — and the store side is a
    bucketed scan feeding the join directly."""
    build_seen_store(
        _docs(spark, [(i, f"doc {i}") for i in range(50)]),
        "id", "text", store, n_buckets=4,
    )
    new = _docs(spark, [(100 + i, f"doc {i * 3}") for i in range(30)])
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        kept = filter_previously_seen(
            new, "id", "text", store_table=store
        )
        kept.collect()
        plan = kept._jdf.queryExecution().executedPlan().toString()
        # AQE's toString() appends the pre-adaptive "Initial Plan" —
        # assert on the final plan section only
        plan = plan.split("== Initial Plan ==")[0]
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert n_shuffles == 1, f"want 1 probe-side shuffle, plan:\n{plan}"
        assert "Bucketed: true" in plan, plan
        # no store-side re-distinct: a distinct would add an aggregate
        # over the store scan — the store feeds the join directly
        assert "HashAggregate" not in plan, plan
        # and the frame tier on identical data pays the second shuffle
        frame_kept = filter_previously_seen(
            new, "id", "text",
            seen=fingerprint_frame(
                _docs(spark, [(i, f"doc {i}") for i in range(50)]),
                "id", "text",
            ),
        )
        frame_kept.collect()
        plan2 = (
            frame_kept._jdf.queryExecution().executedPlan().toString()
        ).split("== Initial Plan ==")[0]
        assert plan2.count("Exchange hashpartitioning") >= 2, plan2
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_append_rejects_mismatched_buckets(spark, store):
    build_seen_store(
        _docs(spark, [(1, "a")]), "id", "text", store, n_buckets=4
    )
    with pytest.raises(Exception):
        append_seen(
            _docs(spark, [(2, "b")]), "id", "text", store, n_buckets=8
        )


def test_maybe_compact_rebuilds_on_duplicate_mass(spark, store):
    """Round 15 (r14 verdict #5): duplicates injected (simulating the
    documented concurrent-append window) → the tick measures them,
    rebuilds via one bucketed rewrite, filter results are identical
    before/after, and the rebuilt store still reads Bucketed: true
    with no store-side Exchange."""
    from petk_spark.operators.dedup import maybe_compact_seen_store

    day0 = _docs(spark, [(i, f"doc {i}") for i in range(40)])
    build_seen_store(day0, "id", "text", store, n_buckets=4)

    # inject duplicate rows DIRECTLY (append_seen's anti-join would
    # refuse them — this is the concurrent-writer leftover shape)
    dup_rows = fingerprint_frame(
        _docs(spark, [(i, f"doc {i}") for i in range(10)]),
        "id", "text",
    ).select("fingerprint")
    (
        dup_rows.write.format("parquet").mode("append")
        .bucketBy(4, "fingerprint").saveAsTable(store)
    )
    assert spark.table(store).count() == 50

    new = _docs(spark, [(100 + i, f"doc {i * 2}") for i in range(30)])
    before = sorted(
        r["id"] for r in filter_previously_seen(
            new, "id", "text", store_table=store
        ).collect()
    )

    # read-only when thresholds don't trip
    res = maybe_compact_seen_store(
        spark, store, n_buckets=4,
        dup_frac_threshold=0.5, max_files_per_bucket=10_000,
    )
    assert res["action"] == "none"
    assert res["total_rows"] == 50 and res["distinct_rows"] == 40
    assert abs(res["dup_frac"] - 0.2) < 1e-9

    # trips on duplicate mass → rebuilt, unique, same filter results
    res = maybe_compact_seen_store(
        spark, store, n_buckets=4, dup_frac_threshold=0.01,
    )
    assert res["action"] == "rebuilt"
    assert spark.table(store).count() == 40
    after_rows = filter_previously_seen(
        new, "id", "text", store_table=store
    )
    assert sorted(r["id"] for r in after_rows.collect()) == before

    # the rebuilt store still honors the scale contract
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        kept = filter_previously_seen(
            new, "id", "text", store_table=store
        )
        kept.collect()
        plan = kept._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Bucketed: true" in plan, plan
        assert "HashAggregate" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_maybe_compact_rebuilds_on_fragmentation(spark, store):
    """Many small appends → file count trips even with zero
    duplicates; the rebuild shrinks the file pile to one per
    non-empty bucket without changing rows."""
    from petk_spark.operators.dedup import maybe_compact_seen_store

    build_seen_store(
        _docs(spark, [(0, "seed doc")]), "id", "text", store,
        n_buckets=4,
    )
    for day in range(1, 6):
        append_seen(
            _docs(spark, [(day * 10 + j, f"d{day} doc {j}")
                          for j in range(3)]),
            "id", "text", store, n_buckets=4,
        )
    rows_before = sorted(
        r["fingerprint"] for r in spark.table(store).collect()
    )
    res = maybe_compact_seen_store(
        spark, store, n_buckets=4,
        dup_frac_threshold=0.5, max_files_per_bucket=1,
    )
    assert res["action"] == "rebuilt"
    assert res["n_files"] > 4          # the pre-rebuild pile
    rows_after = sorted(
        r["fingerprint"] for r in spark.table(store).collect()
    )
    assert rows_after == rows_before
    res2 = maybe_compact_seen_store(
        spark, store, n_buckets=4,
        dup_frac_threshold=0.5, max_files_per_bucket=1,
    )
    assert res2["action"] == "none"    # compaction converged
    assert res2["n_files"] <= 4


def test_compact_external_store_keeps_location_root(spark, store, tmp_path):
    """Round 16 (r15 ADVICE): a store built with path= is EXTERNAL —
    the rebuild must land beside it (alternating __swap dirs), not
    silently relocate to the managed warehouse; the retired directory
    comes back for the caller's reaper; no __old/__compacting tables
    are left behind."""
    from petk_spark.operators.dedup import (
        _table_location,
        maybe_compact_seen_store,
    )

    ext = str(tmp_path / "seen_ext")
    build_seen_store(
        _docs(spark, [(i, f"doc {i}") for i in range(20)]),
        "id", "text", store, n_buckets=4, path=ext,
    )
    # inject duplicates so the tick trips
    dup = fingerprint_frame(
        _docs(spark, [(i, f"doc {i}") for i in range(8)]), "id", "text"
    ).select("fingerprint")
    (
        dup.write.format("parquet").mode("append")
        .bucketBy(4, "fingerprint").saveAsTable(store)
    )
    res = maybe_compact_seen_store(
        spark, store, n_buckets=4, dup_frac_threshold=0.01, path=ext,
    )
    assert res["action"] == "rebuilt"
    assert res["retired_location"].rstrip("/").endswith("seen_ext")
    loc = _table_location(spark, store)
    assert loc is not None and loc.rstrip("/").endswith("__swap_a")
    assert spark.table(store).count() == 20
    # a second trip alternates to the other swap dir
    (
        dup.write.format("parquet").mode("append")
        .bucketBy(4, "fingerprint").saveAsTable(store)
    )
    res2 = maybe_compact_seen_store(
        spark, store, n_buckets=4, dup_frac_threshold=0.01, path=ext,
    )
    assert res2["action"] == "rebuilt"
    loc2 = _table_location(spark, store)
    assert loc2 is not None and loc2.rstrip("/").endswith("__swap_b")
    assert spark.table(store).count() == 20
    # swap hygiene: no staging or aside tables remain
    names = {t.name for t in spark.catalog.listTables()}
    assert f"{store}__compacting".split(".")[-1] not in names
    assert f"{store}__old".split(".")[-1] not in names


def test_corpus_maintenance_tick_runs_both_siblings(spark, store, tmp_path):
    """Round 16 (r15 verdict #7): the one-call daily entry point —
    seen-store tick + IVF health/retrain tick, each optional, each
    summary surfaced under its own key."""
    import numpy as np

    from petk_spark.operators.pipeline import corpus_maintenance_tick
    from petk_spark.operators.similarity import build_ivf_index

    # seen-store only: read-only pass (nothing trips)
    build_seen_store(
        _docs(spark, [(i, f"doc {i}") for i in range(10)]),
        "id", "text", store, n_buckets=4,
    )
    out = corpus_maintenance_tick(
        spark, seen_store_table=store, seen_store_buckets=4,
        seen_dup_frac_threshold=0.5, seen_max_files_per_bucket=10_000,
    )
    assert out["seen_store"]["action"] == "none"
    assert out["ivf_index"] is None

    # both siblings: a healthy small IVF index stays read-only too
    rng = np.random.default_rng(7)
    vecs = [
        (int(i), [float(x) for x in rng.normal(size=8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "id long, vec array<double>")
    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, idx, id_col="id", vec_col="vec", n_centroids=4,
                    iterations=2)
    out = corpus_maintenance_tick(
        spark,
        seen_store_table=store, seen_store_buckets=4,
        seen_dup_frac_threshold=0.5, seen_max_files_per_bucket=10_000,
        ivf_index_path=idx,
    )
    assert out["seen_store"]["action"] == "none"
    assert out["ivf_index"]["action"] in ("none", "compacted")
    assert out["ivf_index"]["generations"] >= 1
