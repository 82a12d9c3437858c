"""Fixture-table reader shared by the driver contract, extensions and
bench.

events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
rejects; it is read as raw nanos (``nanosAsLong``) and profiled as epoch
SECONDS (double) truncated to microseconds — the same double DuckDB
produces from its micro-truncated read of the same file, keeping every
events oracle bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: DuckDB expression producing the identical events.ts epoch-seconds double.
EVENTS_TS_SQL = "(CAST(epoch_us(ts) AS DOUBLE) / 1e6)"


def read_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        return df.withColumn(
            "ts", (F.expr("ts div 1000").cast("double") / F.lit(1e6))
        )
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
