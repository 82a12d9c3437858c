"""Coverage closers for round-3 utility paths: keyed-uniform sanity,
the fuzzy full-cross fallback, and equi-depth mass conservation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_uniform_from_key_is_uniform_and_salted(spark):
    from petk_spark.operators.sampling import uniform_from_key

    df = spark.range(2000).select(F.col("id"))
    u = df.select(uniform_from_key(["id"]).alias("u"))
    row = u.agg(
        F.min("u").alias("mn"), F.max("u").alias("mx"), F.avg("u").alias("avg")
    ).collect()[0]
    assert 0.0 <= row.mn and row.mx < 1.0
    assert abs(row.avg - 0.5) < 0.02  # 2000 uniforms: se ≈ 0.0065
    # independent draws per salt; identical draws per (salt, key)
    a = df.select(uniform_from_key(["id"], "s1").alias("u")).collect()
    b = df.select(uniform_from_key(["id"], "s2").alias("u")).collect()
    a2 = df.select(uniform_from_key(["id"], "s1").alias("u")).collect()
    assert [r.u for r in a] == [r.u for r in a2]
    assert [r.u for r in a] != [r.u for r in b]


def test_fuzzy_pairs_full_cross_fallback(spark):
    from petk_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        [("cat",), ("bat",), ("hat",), ("zebra",), (None,), ("",)],
        "name string",
    )
    got = {
        (r.term_a, r.term_b, r.dist)
        for r in fuzzy_pairs(df, "name", max_dist=1, block_chars=0).collect()
    }
    # block_chars=0 crosses the whole vocab: first-character typos found
    assert got == {("bat", "cat", 1), ("bat", "hat", 1), ("cat", "hat", 1)}
    # prefix blocking (the scale path) misses exactly those by contract
    blocked = fuzzy_pairs(df, "name", max_dist=1, block_chars=1).collect()
    assert blocked == []


def test_equidepth_histogram_conserves_mass(spark):
    from petk_spark.operators.grouped import equidepth_histogram

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = equidepth_histogram(df, "l_extendedprice", n_buckets=7).collect()
    assert sum(r.n for r in out) == df.filter(
        F.col("l_extendedprice").isNotNull()
    ).count()
    assert [r.bucket for r in out] == list(range(1, 8))
    # edges are monotone and each bucket's lo <= hi
    for r in out:
        assert r.edge_lo <= r.edge_hi


def test_assign_split_deterministic_disjoint_and_leakproof(spark):
    from petk_spark.operators.sampling import assign_split

    rows = [(i, i // 4) for i in range(4000)]  # 4 chunks per doc
    df = spark.createDataFrame(rows, "chunk_id long, doc_id long")
    out = assign_split(
        df, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1"
    )
    pdf = out.toPandas()
    # total partition, no NULLs
    assert set(pdf["split"].unique()) <= {"train", "val", "test"}
    assert pdf["split"].notna().all()
    # leak-proof: every chunk of a doc is in the same split
    assert (pdf.groupby("doc_id")["split"].nunique() == 1).all()
    # fractions approximately honored (1000 docs, binomial 3-sigma)
    frac = pdf.groupby("split")["doc_id"].nunique() / 1000
    assert abs(frac.get("train", 0) - 0.8) < 0.05
    assert abs(frac.get("val", 0) - 0.1) < 0.04
    # deterministic across re-runs; different salt reshuffles
    again = assign_split(
        df, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1"
    ).toPandas()
    assert (pdf.sort_values("chunk_id")["split"].values
            == again.sort_values("chunk_id")["split"].values).all()
    other = assign_split(
        df, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s2"
    ).toPandas()
    assert (pdf.sort_values("chunk_id")["split"].values
            != other.sort_values("chunk_id")["split"].values).any()
    # append-stability: adding rows never moves existing ones
    bigger = spark.createDataFrame(
        rows + [(99_000 + i, 99_000 + i) for i in range(100)],
        "chunk_id long, doc_id long",
    )
    grown = assign_split(
        bigger, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1"
    ).toPandas()
    merged = pdf.merge(grown, on="chunk_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()


def test_assign_split_rejects_bad_fractions(spark):
    import pytest as _pytest

    from petk_spark.operators.sampling import assign_split

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="sum"):
        assign_split(df, ["k"], {"train": 0.5, "test": 0.1})


def test_epoch_shuffle_order_and_independence(spark):
    """F43: epoch_shuffle materializes the SAME total order epoch_rank
    reports (range exchange ≡ global window, value-for-value), each
    epoch is an independent permutation, and the production path has
    no global window — a range exchange instead."""
    from petk_spark.operators.sampling import epoch_rank, epoch_shuffle

    df = spark.range(500).select(F.col("id"))
    shuffled = epoch_shuffle(df, ["id"], epoch=1, n_partitions=4)
    # partition-concatenation order == rank order (range partitions
    # are globally ordered, sorted within)
    got = [r["id"] for r in shuffled.toLocalIterator()]
    want = [
        r["id"]
        for r in epoch_rank(df, ["id"], epoch=1)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    # a genuine permutation, deterministic, and epoch-independent
    assert sorted(got) == list(range(500))
    assert got != list(range(500))
    got2 = [
        r["id"]
        for r in epoch_shuffle(df, ["id"], epoch=1, n_partitions=4)
        .toLocalIterator()
    ]
    assert got2 == got
    other = [
        r["id"]
        for r in epoch_shuffle(df, ["id"], epoch=2, n_partitions=4)
        .toLocalIterator()
    ]
    assert other != got and sorted(other) == list(range(500))
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower()


def test_take_token_budget_take_while_semantics(spark):
    """F44: the kept set is the maximal prefix of the keyed order with
    inclusive running sum ≤ budget — once crossed, later rows are
    dropped even when they would individually fit; NULL token counts
    count as 0; bucketing never changes the answer."""
    from petk_spark.operators.sampling import (
        take_token_budget,
        uniform_from_key,
    )

    df = spark.createDataFrame(
        [(i, 10 if i != 7 else None) for i in range(40)],
        "id long, n_tok int",
    )
    order = [
        r["id"]
        for r in df.select(
            "id", uniform_from_key(["id"], "s").alias("u")
        ).orderBy("u", "id").collect()
    ]
    toks = {i: (0 if i == 7 else 10) for i in range(40)}
    run, want = 0, []
    for i in order:
        run += toks[i]
        if run > 155:
            break
        want.append(i)
    got = sorted(
        r["id"]
        for r in take_token_budget(
            df, ["id"], F.col("n_tok"), budget=155, salt="s"
        ).collect()
    )
    assert got == sorted(want) and 0 < len(got) < 40
    # bucketing is semantics-neutral
    for nb in (1, 7, 256):
        alt = sorted(
            r["id"]
            for r in take_token_budget(
                df, ["id"], F.col("n_tok"), budget=155, salt="s",
                n_buckets=nb,
            ).collect()
        )
        assert alt == got, nb
    # degenerate budgets
    assert (
        take_token_budget(df, ["id"], F.col("n_tok"), budget=0).count()
        == 0
    )
    assert (
        take_token_budget(
            df, ["id"], F.col("n_tok"), budget=10**9
        ).count()
        == 40
    )


def test_take_token_budget_no_global_window(spark):
    """The prefix sum is per-range-bucket + a broadcast offset join —
    never a single-reducer global window."""
    from petk_spark.operators.sampling import take_token_budget

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5 + 1).alias("n_tok")
    )
    out = take_token_budget(df, ["id"], F.col("n_tok"), budget=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window exists but is PARTITIONED (by bucket), not global
    assert "Window" in plan
    import re as _re

    assert not _re.search(r"Window \[[^\]]*\], \[\]", plan), plan
    assert "BroadcastHashJoin" in plan
