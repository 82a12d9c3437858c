"""Registry of beyond-reference extension queries (SURVEY §2.F) exposed
to the driver contract. Populated as operators land: dedup, similarity
search, text analysis, grouped/windowed profiling, multimodal."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def oracle_sql() -> dict[str, str]:
    return {}
