"""Unit pins for the reference's quirky semantics (SURVEY §5.2) — the
behaviors the oracle queries can't see: constructor assertions, cache
idempotence/invalidation, result shaping, and the geo string fallback.
Each test fails if the pinned behavior silently changes."""

from __future__ import annotations

import pytest

import petk_spark.report as report_mod
from petk_spark.report import Report


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# -- A2: schema keys must be existing columns (petk/exploration.py:19-20)

def test_schema_unknown_column_raises(spark):
    df = _df(spark, [(1,)], "a int")
    with pytest.raises(AssertionError, match="not a column"):
        Report(df, schema={"nope": {"range": [0, 1]}})


# -- A3: scalar 'nulls' promoted to a 1-list (petk/exploration.py:22-25)

def test_scalar_nulls_promoted_to_list(spark):
    df = _df(spark, [("x",)], "a string")
    r = Report(df, schema={"a": {"nulls": "sentinel"}})
    assert r.schema["a"]["nulls"] == ["sentinel"]


# -- C24: describe memoization — described columns are never recomputed
#    (petk/exploration.py:73-75); the cache key includes include_mad.

def test_describe_memoization_idempotent(spark, monkeypatch):
    df = _df(spark, [(1.0,), (2.0,)], "a double")
    r = Report(df)
    first = {(row["column"], row["statistic"]): row["value_num"]
             for row in r.describe(["a"]).collect()}

    def boom(*a, **k):
        raise AssertionError("describe recomputed a cached column")

    monkeypatch.setattr(report_mod, "describe_frame", boom)
    second = {(row["column"], row["statistic"]): row["value_num"]
              for row in r.describe(["a"]).collect()}
    assert first == second


def test_describe_cache_keyed_on_include_mad(spark):
    df = _df(spark, [(1.0,), (2.0,), (4.0,)], "a double")
    r = Report(df)
    no_mad = {row["statistic"] for row in
              r.describe(["a"], include_mad=False).collect()}
    with_mad = {row["statistic"]: row["value_num"] for row in
                r.describe(["a"], include_mad=True).collect()}
    # include_mad=False drops the all-null mad row (E3); the later
    # mad-inclusive call must NOT be served the cached mad-less rows.
    assert "mad" not in no_mad
    assert with_mad["mad"] == pytest.approx(10.0 / 9.0)


# -- D8: validation memoization + schema-hash invalidation
#    (petk/exploration.py:83-85 and the TODO at :12)

def test_validate_memoization_and_invalidation(spark, monkeypatch):
    df = _df(spark, [(1, 5.0), (2, 50.0)], "id int, v double")
    r = Report(df, schema={"v": {"range": [0, 10]}}, key="id")
    assert r.validate(["v"]).count() == 1  # 50.0 breaches

    calls = []
    real = report_mod.validate_frame

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(report_mod, "validate_frame", counting)
    assert r.validate(["v"]).count() == 1
    assert not calls, "cached column was recomputed"

    # Rule change ⇒ new cache key ⇒ recompute (reference never
    # invalidates — acknowledged TODO, fixed here; CHANGES.md §4).
    r.schema["v"] = {"range": [0, 100]}
    assert r.validate(["v"]).count() == 0
    assert calls, "schema change did not invalidate the cache"


# -- E2: as_dict nesting (petk/exploration.py:143-162)

def test_as_dict_nesting(spark):
    df = _df(spark, [(1.0,), (2.0,)], "a double")
    r = Report(df)
    d = Report.as_dict(r.describe(["a"]), ["column", "statistic"])
    assert d["a"]["count"] == 2.0
    # single non-null value collapses to a scalar, not a 1-dict
    assert not isinstance(d["a"]["count"], dict)


# -- C8: is_unique is nunique == SIZE, so any null ⇒ not unique
#    (petk/tools.py:33)

def test_is_unique_vs_size_with_nulls(spark):
    with_null = _df(spark, [(1,), (2,), (None,)], "a int")
    no_null = _df(spark, [(1,), (2,)], "a int")

    def stat(df, name):
        rows = Report(df).describe(["a"]).collect()
        return {r["statistic"]: r["value_num"] for r in rows}[name]

    assert stat(no_null, "is_unique") == 1.0
    # 2 distinct over size 3 — unique by count, NOT by size
    assert stat(with_null, "is_unique") == 0.0
    assert stat(with_null, "p_unique") == pytest.approx(2.0 / 3.0)


# -- F12: pattern rule — NULLs pass, non-matching values flagged

def test_pattern_rule_nulls_pass(spark):
    df = _df(spark, [(1, "AB-1"), (2, "xy"), (3, None)], "k int, v string")
    rows = Report(df, schema={"v": {"pattern": "^[A-Z]{2}-[0-9]$"}}, key="k") \
        .validate().collect()
    flagged = {r["row_key"] for r in rows}
    assert flagged == {"2"}  # NULL row 3 passes; conforming row 1 passes
    assert all("pattern" in r["notes"] for r in rows)


# -- E3: all-null result rows are dropped on every return
#    (petk/exploration.py:164)

def test_all_null_result_rows_dropped(spark):
    df = _df(spark, [(None,), (None,)], "a double")
    rows = Report(df).describe(["a"]).collect()
    stats = {r["statistic"] for r in rows}
    # numeric moment stats of an all-null column are all-null rows —
    # dropped, like the reference's dropna(how='all')
    assert "mean" not in stats and "std" not in stats
    # value-bearing rows survive
    by_stat = {r["statistic"]: r for r in rows}
    assert by_stat["n_null"]["value_num"] == 2.0
    assert by_stat["content_type"]["value_str"] == "EMPTY"
    assert by_stat["n_zeros"]["value_num"] == 0.0  # coalesced, not null


# -- B8: centroid location renders the reference's no-geopy fallback
#    'x, y' string (petk/tools.py:72-80)

def test_geo_centroid_string_fallback(spark):
    from petk_spark.geo.introduce_geo import introduce_geo_frame

    df = _df(
        spark,
        [("POINT (0 0)",), ("POINT (4 2)",)],
        "geometry string",
    )
    rows = introduce_geo_frame(df, "geometry", crs="epsg:4326").collect()
    loc = {r["metric"]: r["value_str"] for r in rows}["centroid_location"]
    assert loc == "2.0, 1.0"


# -- E4: key_exists nested-dict probe (petk/tools.py:120-129)

def test_key_exists():
    from petk_spark.tools import key_exists

    d = {"a": {"b": {"c": 1}}}
    assert key_exists(d, "a", "b", "c")
    assert key_exists(d, "a")
    assert not key_exists(d, "a", "x")
    assert not key_exists(d, "a", "b", "c", "d")  # non-dict intermediate
    assert not key_exists({}, "a")
