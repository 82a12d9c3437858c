"""Dataset-level summary — ``introduce()``.

Reference parity: petk/exploration.py:34-68. Produces the 2-level-keyed
summary Series as a long ``(section, metric, value_num, value_str)``
frame: basic rows/columns/observations/missing-cells counts plus the
inferred column-type histogram. Geospatial rollups (B7-B11) are emitted
by the geometry kernel when a geometry column is present (see geo/).

Execution: ONE aggregate computing row count + per-column null counts +
the EMPTY probes — a single scan, single job; everything else is schema
metadata resolved on the driver. The memory_usage analogue is an
*estimated* size (the reference reports exact pandas in-RAM bytes,
petk/exploration.py:36 — semantics differ by design; excluded from the
oracle contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petk_spark import constants
from petk_spark.logical_types import static_logical_type

_TYPE_ORDER = [
    constants.TYPE_BOOL,
    constants.TYPE_DATE,
    constants.TYPE_EMPTY,
    constants.TYPE_GEO,
    constants.TYPE_NUM,
    constants.TYPE_STR,
    constants.TYPE_UNSUPPORTED,
]


def _entry_sql(section: str, metric: str, num_expr: str) -> str:
    return (
        "named_struct("
        f"'section', '{section}', "
        f"'metric', '{metric}', "
        f"'value_num', CAST({num_expr} AS DOUBLE), "
        "'value_str', CAST(NULL AS STRING))"
    )


def introduce_frame(df: DataFrame) -> DataFrame:
    """Lazy dataset summary ``(section, metric, value_num, value_str)``."""
    cols = list(df.columns)
    fields = {f.name: f for f in df.schema.fields}
    n_cols = len(cols)

    aggs = ["count(1) AS `::rows`"] + [
        f"count(`{c}`) AS `{c}::count`" for c in cols
    ]
    stats = df.agg(*[F.expr(s) for s in aggs])

    rows = "`::rows`"
    missing = " + ".join(f"({rows} - `{c}::count`)" for c in cols) or "0"

    entries = [
        _entry_sql("basic", "memory_usage", f"{rows} * {8 * n_cols}"),
        _entry_sql("basic", "rows", rows),
        _entry_sql("basic", "columns", str(n_cols)),
        _entry_sql("basic", "observations", f"{rows} * {n_cols}"),
        _entry_sql("basic", "missing_cells", missing),
    ]

    # Column-type histogram (petk/exploration.py:45-49): static logical
    # types refined by the data-dependent EMPTY probe, all from the same
    # single aggregate row. Zero-count types are dropped afterwards to
    # mirror value_counts() (absent types don't appear).
    for t in _TYPE_ORDER:
        terms = []
        for c in cols:
            lt = static_logical_type(fields[c])
            if lt == constants.TYPE_GEO:
                eff = f"'{constants.TYPE_GEO}'"
            else:
                eff = (
                    f"CASE WHEN `{c}::count` = 0 THEN '{constants.TYPE_EMPTY}'"
                    f" ELSE '{lt}' END"
                )
            terms.append(f"CAST({eff} = '{t}' AS INT)")
        entries.append(_entry_sql("columns", t, " + ".join(terms)))

    explode = "explode(array(" + ", ".join(entries) + ")) AS e"
    long = stats.select(F.expr(explode)).select("e.*")
    return long.filter(
        ~((F.col("section") == "columns") & (F.col("value_num") == 0))
    )
