"""Per-column statistical profile — the engine's flagship operator.

Reference parity: petk/exploration.py:70-77 + petk/tools.py:14-70
(``DataReport.describe`` / ``get_description``). The reference computes
10-30 separate eager pandas reductions *per column*. Here every statistic
for every requested column is fused into ONE aggregate expression bundle
— a single scan, a single Spark job, JVM-side whole-stage codegen —
then reshaped to a long ``(column, statistic, value_num, value_str)``
frame by exploding an array of structs over the 1-row aggregate.
Expressions are generated as SQL text and parsed once (a Column-object
builder at this width costs seconds of py4j round trips).

Job structure: approx mode (the 100 TB path) is ONE scan. Exact mode is
two fused scans — the distinct-count bundle runs as its own Aggregate
because Catalyst plans multi-column count(DISTINCT) via EXPAND (row
replication per distinct group), which would evaluate the percentile/
moment expressions over a 12×-multiplied input (measured 88 s → 15 s at
sf0.1 by splitting). ``include_mad`` adds one more scan (mad needs the
mean first).

Statistics and their type gating mirror petk/tools.py exactly:
  * all types:       content_type, memory_usage, count, p_null, n_null
  * non-GEO/UNSUP:   distinct_count, is_constant, is_unique, p_unique
  * BOOLEAN:         mean
  * DATE + NUMERIC:  min, max, 5% 25% 50% 75% 95% quantiles
  * NUMERIC:         mean, std, variance, iqr, kurtosis, skewness, sum,
                     mad, cv, p_infinite, n_infinite, n_zeros, p_zeros

Semantics pinned to the reference:
  * ``is_unique``/``p_unique`` divide by *size* (rows incl. nulls), not
    count — any null makes a column non-unique (petk/tools.py:33).
  * skewness/kurtosis are pandas' *sample-corrected* G1/G2
    (petk/tools.py:59-60), NOT Spark's population g1/g2; corrected via
    closed-form factors from the population moments (functions/moments.py
    documents the algebra; here inlined as SQL).
  * quantiles are exact with linear interpolation (pandas default); DATE
    columns are profiled via epoch seconds (cast to double), matching
    pandas' datetime quantile support (petk/tools.py:47-48).
  * ``mad`` is mean-absolute-deviation about the mean (pandas ``.mad()``),
    requiring the mean first: computed lazily as a second aggregation over
    a broadcast cross-join of the 1-row means — two scans, still one job.
    Pass ``include_mad=False`` for the strict single-scan bundle.
  * ``n_zeros`` counts exact zeros; nulls/NaN are neither zero nor
    infinite (petk/tools.py:51,66-67 via np.count_nonzero).

Scale modes: ``exact=True`` (oracle parity) uses ``count(DISTINCT)`` +
``percentile`` — the latter concentrates each column's values on one
reducer, acceptable to ~10^9 rows. ``exact=False`` switches to
``approx_count_distinct`` + ``percentile_approx`` (mergeable sketches,
bounded executor memory — the true 100 TB path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from petk_spark import constants
from petk_spark.logical_types import static_logical_type

_DISTINCT_SKIP = (constants.TYPE_GEO, constants.TYPE_UNSUPPORTED)

#: Rough per-value byte widths for the *estimated* memory_usage statistic
#: (the reference reports exact pandas in-RAM bytes, petk/tools.py:20 —
#: semantics differ by design; excluded from the oracle contract).
_TYPE_WIDTH = {
    constants.TYPE_BOOL: 1,
    constants.TYPE_DATE: 8,
    constants.TYPE_NUM: 8,
    constants.TYPE_STR: 32,
    constants.TYPE_GEO: 64,
    constants.TYPE_UNSUPPORTED: 32,
    constants.TYPE_EMPTY: 8,
}

_PROBS_SQL = "array(" + ", ".join(str(p) for p in constants.QUANTILES) + ")"


def find_columns(df: DataFrame, columns=None) -> list[str]:
    """Normalize/validate a column selection (petk/exploration.py:128-137):
    default all columns, scalar promoted to list, missing columns raise
    AssertionError."""
    if columns is None:
        return list(df.columns)
    if isinstance(columns, str):
        columns = [columns]
    columns = list(columns)
    missing = [c for c in columns if c not in df.columns]
    assert not missing, f"Columns {missing} not in data"
    return columns


def _nv(name: str, ltype: str) -> str:
    """Numeric projection for min/max/quantile/moment arithmetic. DATE
    columns become fractional epoch seconds — the same double DuckDB's
    epoch() yields, keeping the oracle comparison bit-identical."""
    if ltype == constants.TYPE_DATE:
        return f"CAST(CAST(`{name}` AS TIMESTAMP) AS DOUBLE)"
    return f"CAST(`{name}` AS DOUBLE)"


def _agg_sql(name: str, ltype: str, exact: bool) -> tuple[list[str], list[str]]:
    """Aggregate expressions for one column, aliased ``{name}::{stat}``.

    Returns (main, distinct) expression lists. Exact ``count(DISTINCT)``
    must NOT share an Aggregate with the other statistics: Catalyst
    plans multi-distinct via EXPAND, replicating every input row once
    per distinct group and evaluating the heavy percentile/moment
    expressions over the multiplied input (measured 88 s vs 7 s at
    sf0.1). The caller runs the distinct bundle as a second fused agg
    and broadcast-joins the two 1-row results."""
    nv = _nv(name, ltype)
    c = f"`{name}`"
    out = [f"count({c}) AS `{name}::count`"]
    distinct_out = []

    if ltype not in _DISTINCT_SKIP:
        if exact:
            distinct_out.append(
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS `{name}::distinct_count`"
            )
        else:
            out.append(
                f"CAST(approx_count_distinct({c}) AS BIGINT) AS `{name}::distinct_count`"
            )

    if ltype == constants.TYPE_BOOL:
        out.append(f"avg(CAST({c} AS DOUBLE)) AS `{name}::mean`")

    if ltype in (constants.TYPE_DATE, constants.TYPE_NUM):
        out += [f"min({nv}) AS `{name}::min`", f"max({nv}) AS `{name}::max`"]
        if exact:
            out.append(f"percentile({nv}, {_PROBS_SQL}) AS `{name}::quantiles`")
        else:
            out.append(
                f"percentile_approx({nv}, {_PROBS_SQL}, 10000) AS `{name}::quantiles`"
            )

    if ltype == constants.TYPE_NUM:
        out += [
            f"avg({nv}) AS `{name}::mean`",
            f"stddev_samp({nv}) AS `{name}::std`",
            f"var_samp({nv}) AS `{name}::variance`",
            f"skewness({nv}) AS `{name}::_g1`",
            f"kurtosis({nv}) AS `{name}::_g2`",
            f"sum({nv}) AS `{name}::sum`",
            f"sum(CAST({nv} = double('inf') AS BIGINT)"
            f" + CAST({nv} = double('-inf') AS BIGINT)) AS `{name}::n_infinite`",
            f"sum(CAST({nv} = 0.0 AS BIGINT)) AS `{name}::n_zeros`",
        ]
    return out, distinct_out


def _entry_sql(column: str, statistic: str, num_expr: str, str_expr: str = "CAST(NULL AS STRING)") -> str:
    col_lit = column.replace("'", "\\'")
    return (
        "named_struct("
        f"'column', '{col_lit}', "
        f"'statistic', '{statistic}', "
        f"'value_num', CAST({num_expr} AS DOUBLE), "
        f"'value_str', {str_expr})"
    )


def _long_sql(name: str, ltype: str, has_mad: bool) -> list[str]:
    """Derived statistics + long-form reshaping for one column, as
    named_struct SQL over the 1-row aggregate (column ``::rows`` = size)."""
    rows = "`::rows`"
    cnt = f"`{name}::count`"
    e = []

    if ltype == constants.TYPE_GEO:
        ct = f"'{constants.TYPE_GEO}'"
    else:
        ct = f"CASE WHEN {cnt} = 0 THEN '{constants.TYPE_EMPTY}' ELSE '{ltype}' END"
    e.append(_entry_sql(name, "content_type", "NULL", ct))
    e.append(
        _entry_sql(name, "memory_usage", f"{rows} * {_TYPE_WIDTH[ltype]} + 128")
    )
    e.append(_entry_sql(name, "count", cnt))
    e.append(_entry_sql(name, "p_null", f"try_divide({rows} - {cnt}, {rows})"))
    e.append(_entry_sql(name, "n_null", f"{rows} - {cnt}"))

    if ltype not in _DISTINCT_SKIP:
        nd = f"`{name}::distinct_count`"
        e += [
            _entry_sql(name, "distinct_count", nd),
            _entry_sql(name, "is_constant", f"CAST({nd} = 1 AS INT)"),
            _entry_sql(name, "is_unique", f"CAST({nd} = {rows} AS INT)"),
            _entry_sql(name, "p_unique", f"try_divide({nd}, {rows})"),
        ]

    if ltype == constants.TYPE_BOOL:
        e.append(_entry_sql(name, "mean", f"`{name}::mean`"))

    if ltype in (constants.TYPE_DATE, constants.TYPE_NUM):
        q = f"`{name}::quantiles`"
        e += [
            _entry_sql(name, "min", f"`{name}::min`"),
            _entry_sql(name, "max", f"`{name}::max`"),
        ]
        e += [
            _entry_sql(name, label, f"{q}[{i}]")
            for i, label in enumerate(constants.QUANTILE_LABELS)
        ]

    if ltype == constants.TYPE_NUM:
        q = f"`{name}::quantiles`"
        n = f"CAST({cnt} AS DOUBLE)"
        g1 = f"`{name}::_g1`"
        g2 = f"`{name}::_g2`"
        n_inf = f"`{name}::n_infinite`"
        n_zero = f"`{name}::n_zeros`"
        mad = f"`{name}::mad`" if has_mad else "NULL"
        # Sample-corrected moments (see functions/moments.py for the
        # algebra; pandas G1/G2, petk/tools.py:59-60).
        skew = (
            f"CASE WHEN {n} >= 3 THEN {g1} * sqrt({n} * ({n} - 1)) / ({n} - 2) END"
        )
        kurt = (
            f"CASE WHEN {n} >= 4 THEN ({n} - 1) / (({n} - 2) * ({n} - 3))"
            f" * (({n} + 1) * {g2} + 6) END"
        )
        e += [
            _entry_sql(name, "mean", f"`{name}::mean`"),
            _entry_sql(name, "std", f"`{name}::std`"),
            _entry_sql(name, "variance", f"`{name}::variance`"),
            _entry_sql(name, "iqr", f"{q}[3] - {q}[1]"),
            _entry_sql(name, "kurtosis", kurt),
            _entry_sql(name, "skewness", skew),
            _entry_sql(name, "sum", f"`{name}::sum`"),
            _entry_sql(name, "mad", mad),
            # try_divide ≡ DuckDB's NULL-on-zero-divisor double division —
            # keeps cv (mean=0) and the ratios (empty frame) oracle-equal
            # instead of raising under ANSI mode.
            _entry_sql(name, "cv", f"try_divide(`{name}::std`, `{name}::mean`)"),
            _entry_sql(name, "p_infinite", f"try_divide({n_inf}, {rows})"),
            _entry_sql(name, "n_infinite", n_inf),
            _entry_sql(name, "n_zeros", n_zero),
            _entry_sql(name, "p_zeros", f"try_divide({n_zero}, {rows})"),
        ]
    return e


def describe_frame(
    df: DataFrame,
    columns=None,
    exact: bool = True,
    include_mad: bool = True,
) -> DataFrame:
    """Lazy long-form statistical profile of ``df``.

    Returns a DataFrame ``(column, statistic, value_num, value_str)``.
    Booleans are encoded 1.0/0.0 in value_num; content_type lives in
    value_str; DATE min/max/quantiles are epoch seconds.
    """
    cols = find_columns(df, columns)
    fields = {f.name: f for f in df.schema.fields}
    ltypes = {c: static_logical_type(fields[c]) for c in cols}

    aggs = ["count(1) AS `::rows`"]
    distinct_aggs = []
    for c in cols:
        main, dist = _agg_sql(c, ltypes[c], exact)
        aggs += main
        distinct_aggs += dist
    stats = df.agg(*[F.expr(s) for s in aggs])
    if distinct_aggs:
        distinct = df.agg(*[F.expr(s) for s in distinct_aggs])
        stats = stats.crossJoin(F.broadcast(distinct))

    num_cols = [c for c in cols if ltypes[c] == constants.TYPE_NUM]
    has_mad = bool(include_mad and num_cols)
    if has_mad:
        means = df.agg(
            *[F.expr(f"avg({_nv(c, ltypes[c])}) AS `{c}::m`") for c in num_cols]
        )
        mad = df.crossJoin(F.broadcast(means)).agg(
            *[
                F.expr(
                    f"avg(abs({_nv(c, ltypes[c])} - `{c}::m`)) AS `{c}::mad`"
                )
                for c in num_cols
            ]
        )
        stats = stats.crossJoin(F.broadcast(mad))

    entries = []
    for c in cols:
        entries += _long_sql(c, ltypes[c], has_mad)
    explode = "explode(array(" + ", ".join(entries) + ")) AS e"
    return stats.select(F.expr(explode)).select("e.*")
