"""Result sinks (SURVEY §2.A5).

The reference returns in-memory pandas objects and has no sinks; the
engine's reports are small DataFrames, so sinks are thin wrappers —
but violation tables can be data-sized (every bad row), so those write
distributed, partitioned by the rule that fired."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_report(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Write a (small) report frame: single file, no partitioning."""
    df.coalesce(1).write.format(fmt).mode(mode).save(path)


def write_violations(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: str = "function"
) -> None:
    """Write a violation table partitioned by rule name — violations
    scale with data, so they stay distributed and partition-pruned for
    per-rule consumers."""
    df.write.partitionBy(partition_by).mode(mode).parquet(path)
