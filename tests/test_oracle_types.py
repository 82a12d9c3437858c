"""Guard the driver's pandas hashing path: DuckDB HUGEINT results are
converted to float64 by ``fetchdf``, so an oracle column typed HUGEINT
formats as ``1.000000e+00`` while the Spark side returns int ``1`` —
rows compare equal value-wise but the %.6e hash diverges (the exact
r3 failure mode of sessionize_events.session_seq and
completeness_over_time.n_null: DuckDB ``sum()`` on integers widens to
HUGEINT). Every integer-valued oracle column must therefore be typed
as a pandas-safe integer (BIGINT & narrower)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import duck_connection

SF_DIR = "/root/testdata/sf0.001"

PANDAS_UNSAFE = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def test_no_hugeint_oracle_columns():
    import __spark_entry__ as entry

    con = duck_connection(SF_DIR)
    offenders = []
    for name, sql in entry.oracle_sql().items():
        try:
            rel = con.sql(sql)
            types = [str(t) for t in rel.types]
        except Exception as exc:  # pragma: no cover - surfaced by test_oracle
            pytest.fail(f"{name}: oracle SQL failed to prepare: {exc}")
        bad = [
            (c, t)
            for c, t in zip(rel.columns, types)
            if t in PANDAS_UNSAFE or t.startswith("DECIMAL")
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "oracle twins with pandas-unsafe columns (fetchdf widens HUGEINT "
        "and DECIMAL to float64 / object and breaks the %.6e hash): "
        f"{offenders}"
    )


def test_no_decimal_or_float32_spark_columns(spark):
    """Spark-side output types that format differently per fetch path:
    DecimalType collects as decimal.Decimal (str '1.50') but converts
    to float64 under toPandas; FloatType collects as float32-rounded
    float whose %.6e can disagree with the oracle's float64 in the 7th
    digit. Neither may appear in a declared query's output schema."""
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        try:
            schema = fn(spark, SF_DIR).schema
        except Exception as exc:  # pragma: no cover - surfaced by test_oracle
            pytest.fail(f"{name}: query failed to build: {exc}")
        bad = [
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if f.dataType.simpleString().startswith(("decimal", "float"))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        f"queries with fetch-path-unstable output types: {offenders}"
    )
