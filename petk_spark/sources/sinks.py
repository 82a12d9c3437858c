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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 128,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key. Every later equi-join or aggregation on ``bucket_cols`` between
    tables bucketed the same way reads co-located buckets and SKIPS its
    shuffle entirely — the right layout for corpora that are repeatedly
    joined on a document key across dedup/enrichment stages, where one
    write amortizes N shuffles of the 100 TB fact side.
    (Bucketing requires the table metastore path — ``saveAsTable``, not
    ``save``; pass ``path`` to control the storage location.)"""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
