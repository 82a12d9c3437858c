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
