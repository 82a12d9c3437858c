"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; each ``queries()[name]`` runs at
sf=0.01 and is hash-compared against ``oracle_sql()[name]`` via DuckDB.
Every oracle-facing query formats continuous values through the shared
'%.6e' contract (petk_spark/functions/oracle_fmt.py) on both engines so
last-ulp summation noise cannot flap the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petk_spark import oracle
from petk_spark.functions.oracle_fmt import duckdb_fmt_sci, fmt_sci
from petk_spark.operators.describe import describe_frame
from petk_spark.operators.introduce import introduce_frame
from petk_spark.operators.validate import validate_frame
from petk_spark.nulls import canonicalize_nulls
from petk_spark.report import Report
from petk_spark.sources.tables import read_table as _read


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full fused statistical profile of lineitem at sf0.001."""
    df = _read(spark, "/root/testdata/sf0.001", "lineitem")
    report = Report(df, key=["l_orderkey", "l_linenumber"])
    return report.describe()


# ---------------------------------------------------------------------------
# describe / introduce
# ---------------------------------------------------------------------------

def _shape_describe(long: DataFrame) -> DataFrame:
    """Shared oracle shaping for describe results: drop memory_usage
    (excluded semantics, CHANGES.md §2), fmt values, and apply E3 — a
    statistic undefined for its column is a DROPPED row, not a NULL row
    (petk/exploration.py:164; the oracle twin has the same WHERE)."""
    return (
        long.filter(F.col("statistic") != "memory_usage")
        .select(
            F.col("column").alias("col_name"),
            "statistic",
            F.when(F.col("statistic") == "content_type", F.col("value_str"))
            .otherwise(fmt_sci(F.col("value_num")))
            .alias("value"),
        )
        .filter(F.col("value").isNotNull())
    )


def _describe_query(table: str, columns=None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _read(spark, sf_dir, table)
        return _shape_describe(
            describe_frame(df, columns, exact=True, include_mad=True)
        )

    return q


def _describe_empty_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 through the oracle contract: describe an ALL-NULL column via
    the full user-facing Report path (lazy null canonicalization →
    fused describe → per-column memoization → `_drop_all_null_rows`).
    The all-null column's undefined statistics (min/max/quantiles/
    moments/sum/mad/cv) must be ABSENT rows — petk/exploration.py:164 —
    while its defined ones (content_type EMPTY, count 0, p_null 1,
    n_zeros/n_infinite 0, ...) hash-match the DuckDB twin."""
    df = _read(spark, sf_dir, "customer").withColumn(
        "c_all_null", F.lit(None).cast("double")
    )
    report = Report(df, key="c_custkey")
    return _shape_describe(report.describe(["c_custkey", "c_all_null"]))


def _introduce_query(table: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _read(spark, sf_dir, table)
        long = introduce_frame(df)
        return long.filter(F.col("metric") != "memory_usage").select(
            "section", "metric", fmt_sci(F.col("value_num")).alias("value")
        )

    return q


def _describe_pair(t1: str, t2: str):
    """Two describe variants consolidated into one oracle row (round 4:
    the driver checks only the first 50 registry entries, so redundant
    table variants stack via UNION ALL — the per-table fused plans are
    unchanged, and the column-name prefixes keep rows disjoint)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _describe_query(t1)(spark, sf_dir).unionAll(
            _describe_query(t2)(spark, sf_dir)
        )

    return q


def _introduce_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """introduce over lineitem + events in one frame, tagged by table
    (the (section, metric) keys collide across tables)."""
    a = _introduce_query("lineitem")(spark, sf_dir).select(
        F.lit("lineitem").alias("tbl"), "*"
    )
    b = _introduce_query("events")(spark, sf_dir).select(
        F.lit("events").alias("tbl"), "*"
    )
    return a.unionAll(b)


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

_LINEITEM_RULES = {
    "l_quantity": {"range": [2, 45]},
    "l_discount": {"range": [0.0, 0.08]},
    "l_returnflag": {"accepted": ["A", "N"]},
}
_LINEITEM_KEY = ["l_orderkey", "l_linenumber"]


def _validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _read(spark, sf_dir, "lineitem")
    return validate_frame(df, _LINEITEM_RULES, _LINEITEM_KEY).select(
        F.col("column").alias("col_name"), "row_key",
        F.col("function").alias("rule_name"), "notes",
    )


_VALIDATE_LINEITEM_SQL = """
WITH keyed AS MATERIALIZED (
  SELECT *, l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR AS row_key
  FROM lineitem
)
SELECT 'l_quantity' AS col_name, row_key,
       'range' AS rule_name,
       CASE WHEN l_quantity < 2 THEN 'Value is less than the lower bound'
            ELSE 'Value is greater than the upper bound' END AS notes
FROM keyed WHERE l_quantity < 2 OR l_quantity > 45
UNION ALL
SELECT 'l_discount', row_key, 'range',
       CASE WHEN l_discount < 0.0 THEN 'Value is less than the lower bound'
            ELSE 'Value is greater than the upper bound' END
FROM keyed WHERE l_discount < 0.0 OR l_discount > 0.08
UNION ALL
SELECT 'l_returnflag', row_key, 'accepted', 'Value not within the accepted range'
FROM keyed WHERE l_returnflag NOT IN ('A', 'N') OR l_returnflag IS NULL
"""


def _validate_verbose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — violations joined back to full original rows (broadcast).
    Uses orders: o_orderkey is a genuinely unique key (lineitem's
    (l_orderkey, l_linenumber) is NOT unique in the synthetic data, which
    would multiply the join)."""
    df = _read(spark, sf_dir, "orders")
    report = Report(
        df, schema={"o_totalprice": {"range": [5000, 250000]}}, key="o_orderkey"
    )
    out = report.validate(verbose=True)
    return out.select(
        "row_key", "o_orderkey", "o_orderstatus",
        fmt_sci(F.col("o_totalprice")).alias("totalprice"), "notes",
    )


_VALIDATE_VERBOSE_SQL = f"""
SELECT o_orderkey::VARCHAR AS row_key,
       o_orderkey, o_orderstatus,
       {duckdb_fmt_sci('o_totalprice')} AS totalprice,
       CASE WHEN o_totalprice < 5000 THEN 'Value is less than the lower bound'
            ELSE 'Value is greater than the upper bound' END AS notes
FROM orders WHERE o_totalprice < 5000 OR o_totalprice > 250000
"""


def _null_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — per-column null counts after sentinel canonicalization."""
    df = _read(spark, sf_dir, "customer")
    schema = {"c_mktsegment": {"nulls": ["BUILDING"]}, "c_acctbal": {"nulls": [-1.0]}}
    canon = canonicalize_nulls(df, schema)
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in canon.columns
    ]
    wide = canon.agg(*aggs)
    entries = [
        F.struct(F.lit(c).alias("col_name"), F.col(c).alias("n_null"))
        for c in canon.columns
    ]
    return wide.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


_NULL_CANON_SQL = """
WITH a AS MATERIALIZED (
  SELECT
    count_if(c_custkey IS NULL)::BIGINT AS c_custkey,
    count_if(c_name IS NULL OR c_name IN ('null', ''))::BIGINT AS c_name,
    count_if(c_nationkey IS NULL)::BIGINT AS c_nationkey,
    count_if(c_acctbal IS NULL OR isnan(c_acctbal) OR c_acctbal = -1.0)::BIGINT AS c_acctbal,
    count_if(c_mktsegment IS NULL OR c_mktsegment IN ('BUILDING', 'null', ''))::BIGINT AS c_mktsegment
  FROM customer
)
SELECT 'c_custkey' AS col_name, c_custkey AS n_null FROM a
UNION ALL SELECT 'c_name', c_name FROM a
UNION ALL SELECT 'c_nationkey', c_nationkey FROM a
UNION ALL SELECT 'c_acctbal', c_acctbal FROM a
UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM a
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER IS THE DRIVER CONTRACT: the driver hash-checks the first 50
    # entries of this merged dict (9 core + 41 extension twins = 50;
    # the 2 declared no-oracle stubs sit last).
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "describe_lineitem": _describe_query("lineitem"),
        "describe_events": _describe_query("events"),
        "describe_orders_customer": _describe_pair("orders", "customer"),
        "describe_docs_embeddings": _describe_pair("documents", "embeddings"),
        "describe_empty_col": _describe_empty_col,
        "introduce_tables": _introduce_tables,
        "validate_lineitem": _validate_lineitem,
        "validate_verbose_join": _validate_verbose,
        "null_canonicalization": _null_canonicalization,
    }
    from petk_spark.operators import extensions_registry

    q.update(extensions_registry.queries())
    return q


def oracle_sql() -> dict[str, str]:
    sql = {
        "describe_lineitem": oracle.describe_sql("lineitem"),
        "describe_events": oracle.describe_sql("events"),
        "describe_orders_customer": (
            f"SELECT * FROM ({oracle.describe_sql('orders')})"
            f" UNION ALL SELECT * FROM ({oracle.describe_sql('customer')})"
        ),
        "describe_docs_embeddings": (
            f"SELECT * FROM ({oracle.describe_sql('documents')})"
            f" UNION ALL SELECT * FROM ({oracle.describe_sql('embeddings')})"
        ),
        "describe_empty_col": oracle.describe_sql(
            "customer_allnull",
            columns=["c_custkey", "c_all_null"],
            source_sql=oracle.CUSTOMER_ALLNULL_SRC,
        ),
        "introduce_tables": (
            f"SELECT 'lineitem' AS tbl, * FROM ({oracle.introduce_sql('lineitem')})"
            f" UNION ALL SELECT 'events' AS tbl, *"
            f" FROM ({oracle.introduce_sql('events')})"
        ),
        "validate_lineitem": _VALIDATE_LINEITEM_SQL,
        "validate_verbose_join": _VALIDATE_VERBOSE_SQL,
        "null_canonicalization": _NULL_CANON_SQL,
    }
    from petk_spark.operators import extensions_registry

    sql.update(extensions_registry.oracle_sql())
    return sql
