"""Run every declared driver query against its DuckDB oracle at sf0.001
— the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.driver_replica import strict_compare
from tests.oracle_harness import compare, duck_connection

SF_DIR = os.environ.get("PETK_TEST_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLE:
        assert sdf.count() >= 0  # rows-only check, like the driver
        return
    # Strict = the driver's own formatting model (toPandas vs fetchdf,
    # %.6e floats / str otherwise), so TYPE divergences that format
    # differently (HUGEINT→float64, int-vs-float) fail here exactly as
    # they would in CORRECTNESS_r{N}. The lenient value-level compare
    # runs only to enrich the failure message (values wrong vs format
    # drift only).
    ok, detail = strict_compare(sdf, duck, _ORACLE[name])
    if not ok:
        lenient_ok, lenient_detail = compare(
            _QUERIES[name](spark, SF_DIR), duck, _ORACLE[name]
        )
        detail += (
            " [values equal, FORMAT/TYPE drift only]" if lenient_ok
            else f" [values differ too: {lenient_detail}]"
        )
    assert ok, f"{name}: {detail}"
