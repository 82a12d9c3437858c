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
            (c, t) for c, t in zip(rel.columns, types) if t in PANDAS_UNSAFE
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        "oracle twins with pandas-unsafe integer columns (fetchdf will "
        f"widen to float64 and break the %.6e hash): {offenders}"
    )
