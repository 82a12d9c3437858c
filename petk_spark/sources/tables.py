"""Fixture-table reader shared by the driver contract, extensions and
bench.

events.ts is a parquet timestamp column profiled as epoch SECONDS
(double) at microsecond resolution — the same double DuckDB produces
from ``epoch_us(ts)/1e6``, keeping every events oracle bit-comparable.
The conversion is timezone-independent (``timestampdiff`` against the
NTZ epoch), so a driver session with a non-UTC session timezone cannot
shift the profile. Older Spark builds read TIMESTAMP(NANOS) parquet
only as raw ``bigint`` nanos (``nanosAsLong``); that legacy shape is
still handled for compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: DuckDB expression producing the identical events.ts epoch-seconds double.
EVENTS_TS_SQL = "(CAST(epoch_us(ts) AS DOUBLE) / 1e6)"

#: Session-keyed DataFrame handles per (applicationId, sf_dir, table).
#: ``spark.read.parquet`` pays ~50-75 ms of driver work PER CALL (file
#: listing, footer schema read, source resolution over py4j) for the
#: same immutable file set — a cost a production deployment amortizes
#: through the catalog/metastore and Spark's own per-session
#: file-listing cache (``filesourcePartitionFileCacheSize``, guide §6).
#: The memo caches the lazy PLAN HANDLE only: no rows, no results, no
#: materialized state — every action against it re-reads the parquet
#: from disk. Keyed by applicationId so a new session (new JVM,
#: regenerated testdata) never sees a stale handle. (Round 17.)
_READ_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, table)
    got = _READ_CACHE.get(key)
    if got is not None:
        return got
    df = _read_table(spark, sf_dir, table)
    _READ_CACHE[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        try:  # removed in Spark 4.1+ (nanos now read as TIMESTAMP_NTZ)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":  # legacy nanosAsLong read
            ts = F.expr("ts div 1000").cast("double") / F.lit(1e6)
        elif dtype == "timestamp_ntz":  # naive micros — diff vs NTZ epoch
            ts = (
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ).cast("double")
                / F.lit(1e6)
            )
        else:  # instant (LTZ) micros — absolute offset from UTC epoch
            ts = F.expr("unix_micros(ts)").cast("double") / F.lit(1e6)
        return df.withColumn("ts", ts)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
