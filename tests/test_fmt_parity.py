"""fmt_sci ↔ duckdb_fmt_sci string parity — THE fragile seam of the
oracle contract (two-stage %.7e→%.6e rounding; see
petk_spark/functions/oracle_fmt.py). Any change near oracle_fmt must
keep this green: the probe feeds adversarial doubles (decimal ties the
two-stage snap deliberately creates, magnitude extremes, negatives,
zero-band values, denormals) plus seeded random values through BOTH
engines and diffs the rendered strings cell by cell."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from petk_spark.functions.oracle_fmt import duckdb_fmt_sci, fmt_sci

ADVERSARIAL = [
    # decimal ties at the 7th significant digit (money-style data)
    5422.2525, 5422.2525000000005, 5422.252499999999,
    12345675.0, 1234567.5, 123456.75, 1.2345675, 0.12345675,
    9999999.5, 99999995.0, 999999.95,
    2.5, 0.25, -2.5, -0.25,
    # magnitude extremes
    1e308, -1e308, 1e-308, 4.9e-324, 2.2250738585072014e-308,
    # zero band (|x| < 1e-10 snaps to +0)
    0.0, -0.0, 1e-11, -1e-11, 9.999999e-11,
    # boundary just outside the zero band
    1.0000001e-10, -1.0000001e-10,
    # exact powers and near-powers of 2 and 10
    1024.0, 1023.9999999999999, 1e6, 999999.9999999999,
    # non-finite
    float("inf"), float("-inf"), float("nan"),
]


def _expected_pairs(spark, values):
    sdf = spark.createDataFrame([(v,) for v in values], "x double").select(
        fmt_sci(F.col("x")).alias("s")
    )
    got_spark = [r["s"] for r in sdf.collect()]
    con = duckdb.connect()
    expr = duckdb_fmt_sci("x")
    got_duck = [
        con.execute(f"SELECT {expr} FROM (SELECT ? :: DOUBLE AS x)", [v]).fetchone()[0]
        for v in values
    ]
    return got_spark, got_duck


def test_adversarial_doubles_render_identically(spark):
    s, d = _expected_pairs(spark, ADVERSARIAL)
    diffs = [
        (v, a, b) for v, a, b in zip(ADVERSARIAL, s, d) if a != b
    ]
    assert not diffs, f"fmt divergence: {diffs}"


def test_random_doubles_render_identically(spark):
    rng = random.Random(20260814)
    values = []
    for _ in range(600):
        kind = rng.random()
        if kind < 0.4:
            # money-style: 2-decimal values, the tie factory
            values.append(round(rng.uniform(-1e6, 1e6), 2))
        elif kind < 0.7:
            values.append(rng.uniform(-1e12, 1e12))
        else:
            values.append(rng.uniform(-1, 1) * 10 ** rng.randint(-30, 30))
    values = [v for v in values if not math.isnan(v)]
    s, d = _expected_pairs(spark, values)
    diffs = [(v, a, b) for v, a, b in zip(values, s, d) if a != b]
    assert not diffs, f"fmt divergence on {len(diffs)} values: {diffs[:5]}"


def test_null_renders_null_both_engines(spark):
    sdf = spark.createDataFrame([(None,)], "x double").select(
        fmt_sci(F.col("x")).alias("s")
    )
    assert sdf.collect()[0]["s"] is None
    con = duckdb.connect()
    assert (
        con.execute(
            f"SELECT {duckdb_fmt_sci('x')} FROM (SELECT NULL::DOUBLE AS x)"
        ).fetchone()[0]
        is None
    )


@pytest.mark.parametrize("v,expect", [
    (float("inf"), "Infinity"),
    (float("-inf"), "-Infinity"),
    (float("nan"), "NaN"),
    (0.0, "0.000000e+00"),
    (-0.0, "0.000000e+00"),
    (5e-11, "0.000000e+00"),
])
def test_fixed_tokens(spark, v, expect):
    got = (
        spark.createDataFrame([(v,)], "x double")
        .select(fmt_sci(F.col("x")).alias("s"))
        .collect()[0]["s"]
    )
    assert got == expect
