"""Oracle twins under a hostile session config — the driver builds its
own SparkSession and nothing guarantees UTC or non-ANSI. A non-UTC zone
shifted every date statistic by the zone offset until describe._nv
became zone-independent (unix_date / timestampdiff / unix_micros per
temporal flavor); this pins that invariant with the exact queries that
went red under --adversarial, plus the ts-derived monitors.

The full 50-twin adversarial sweep lives in tests/driver_replica.py
(``--adversarial``); this is the fast CI cross-section.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.driver_replica import strict_compare
from tests.oracle_harness import duck_connection

SF_DIR = os.environ.get("PETK_TEST_SF_DIR", "/root/testdata/sf0.001")

#: date/ts-heavy twins — the ones a session-zone dependence breaks.
QUERIES = [
    "describe_lineitem",        # l_shipdate quantiles/min/max
    "describe_orders_customer", # o_orderdate
    "sessionize_events",        # events.ts epoch windows
    "completeness_over_time",   # events.ts hour buckets
]

HOSTILE = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.ansi.enabled": "true",
}


@pytest.fixture()
def hostile_session(spark):
    saved = {k: spark.conf.get(k) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", QUERIES)
def test_twin_holds_under_hostile_session(hostile_session, name):
    con = duck_connection(SF_DIR)
    try:
        ok, detail = strict_compare(
            entrymod.queries()[name](hostile_session, SF_DIR),
            con,
            entrymod.oracle_sql()[name],
        )
        assert ok, f"{name} diverged under hostile session conf: {detail}"
    finally:
        con.close()


@pytest.mark.parametrize("name", ["sessionize_events", "completeness_over_time"])
def test_events_twin_holds_under_ltz_parquet_read(hostile_session, name):
    """Older Sparks (and inferTimestampNTZ=false) read the NTZ parquet
    ts as TIMESTAMP (instant). Spark stores the raw micros unadjusted —
    the session zone affects rendering only — so read_table's
    unix_micros branch must stay zone-free even combined with a non-UTC
    session. Guards against driver pyspark-version drift."""
    spark = hostile_session
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    con = duck_connection(SF_DIR)
    try:
        ok, detail = strict_compare(
            entrymod.queries()[name](spark, SF_DIR),
            con,
            entrymod.oracle_sql()[name],
        )
        assert ok, f"{name} diverged under LTZ parquet read: {detail}"
    finally:
        spark.conf.set(key, saved)
        con.close()
