"""Lazy null canonicalization.

Reference parity: petk/exploration.py:27-29 destructively replaces the
canonical null set (petk/constants.py:11 — ``[None, NaN, 'null', '']``)
plus per-column user sentinels with NaN in every column, eagerly, at
ingest. Here the same canonicalization is a *lazy projection* composed
onto the plan — Catalyst folds it into the scan, so it costs nothing
extra at 100 TB and is never materialized.

NaN ≡ NULL contract: pandas does not distinguish NaN from missing; Spark
does. Every float/double column is normalized with ``nanvl`` so all
downstream statistics see one missingness concept (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from petk_spark import constants
from petk_spark.logical_types import is_floating, static_logical_type


def _canonical_column(field: T.StructField, sentinels: list) -> Column:
    c = F.col(field.name)
    ltype = static_logical_type(field)

    conds = []
    if is_floating(field):
        conds.append(F.isnan(c))

    if ltype == constants.TYPE_STR:
        string_sentinels = [s for s in sentinels if isinstance(s, str)]
        string_sentinels += constants.NULL_STRING_SENTINELS
        conds.append(c.isin(string_sentinels))
    elif ltype in (constants.TYPE_NUM, constants.TYPE_DATE, constants.TYPE_BOOL):
        typed = [s for s in sentinels if s is not None and not isinstance(s, str)]
        # Numeric sentinels like -1 (reference README.md:51) are compared
        # after Spark's implicit cast; string sentinels never match
        # non-string columns (pandas .replace has the same no-op effect).
        if ltype == constants.TYPE_NUM and typed:
            conds.append(c.isin(typed))
        elif typed:
            conds.append(c.isin(typed))

    if not conds:
        return c.alias(field.name)

    pred = conds[0]
    for extra in conds[1:]:
        pred = pred | extra
    out = F.when(c.isNull() | pred, F.lit(None).cast(field.dataType)).otherwise(c)
    return out.alias(field.name)


def canonicalize_nulls(df: DataFrame, schema: dict | None = None) -> DataFrame:
    """Return ``df`` with the canonical null projection applied to every
    column. ``schema`` is the validation-rules dict; per-column ``nulls``
    entries add user sentinels (petk/exploration.py:22-29).
    """
    schema = schema or {}
    cols = []
    for field in df.schema.fields:
        sentinels = list((schema.get(field.name) or {}).get("nulls", []))
        cols.append(_canonical_column(field, sentinels))
    return df.select(*cols)
