"""DuckDB oracle-SQL generators.

For every oracle-checkable operator the engine declares, this module
emits the ANSI/DuckDB SQL computing the *same logical result* with the
same column names, so the driver's side-by-side hash comparison
(row-count + schema + order-insensitive value hash) passes. Continuous
values are rendered through the shared '%.6e' contract
(functions/oracle_fmt.py) on both engines.

The generators mirror, stat for stat, the semantics of
operators/describe.py and operators/introduce.py — including pandas
sample-corrected G1/G2 (DuckDB's skewness/kurtosis are the same
estimators), linear-interpolation quantiles (quantile_cont), epoch-
second DATE profiling, and the EMPTY type probe.
"""

from __future__ import annotations

from petk_spark import constants
from petk_spark.functions.oracle_fmt import duckdb_fmt_sci as fmt

# Logical types of the driver's fixture tables (FIXTURES.md §A), used to
# generate type-gated stat bundles exactly like the Spark side does from
# StructType.
N, S, D, U = (
    constants.TYPE_NUM,
    constants.TYPE_STR,
    constants.TYPE_DATE,
    constants.TYPE_UNSUPPORTED,
)
TABLE_TYPES: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", N), ("r_name", S)],
    "nation": [("n_nationkey", N), ("n_name", S), ("n_regionkey", N)],
    "customer": [
        ("c_custkey", N), ("c_name", S), ("c_nationkey", N),
        ("c_acctbal", N), ("c_mktsegment", S),
    ],
    "supplier": [("s_suppkey", N), ("s_name", S), ("s_nationkey", N), ("s_acctbal", N)],
    "part": [
        ("p_partkey", N), ("p_name", S), ("p_brand", S),
        ("p_type", S), ("p_size", N), ("p_retailprice", N),
    ],
    "orders": [
        ("o_orderkey", N), ("o_custkey", N), ("o_orderstatus", S),
        ("o_totalprice", N), ("o_orderdate", D), ("o_orderpriority", S),
    ],
    "lineitem": [
        ("l_orderkey", N), ("l_partkey", N), ("l_suppkey", N),
        ("l_linenumber", N), ("l_quantity", N), ("l_extendedprice", N),
        ("l_discount", N), ("l_tax", N), ("l_returnflag", S),
        ("l_linestatus", S), ("l_shipdate", D),
    ],
    "events": [
        ("event_id", N), ("ts", N), ("user_id", N),
        ("event_type", S), ("value", N), ("props", S),
    ],
    "documents": [
        ("doc_id", N), ("text", S), ("lang", S), ("source", S), ("n_chars", N),
    ],
    "embeddings": [("vec_id", N), ("embedding", U), ("label", N)],
    # Synthetic: customer with an appended all-null double column — the
    # E3 oracle fixture (describe_empty_col in __spark_entry__).
    "customer_allnull": [("c_custkey", N), ("c_all_null", N)],
}

#: FROM-source for the synthetic E3 fixture above.
CUSTOMER_ALLNULL_SRC = (
    "(SELECT customer.*, CAST(NULL AS DOUBLE) AS c_all_null FROM customer)"
)

_QLABEL = dict(zip(constants.QUANTILE_LABELS, constants.QUANTILES))


#: Per-column source-expression overrides for oracle parity. events.ts
#: is parquet timestamp data: both engines profile it as epoch seconds
#: at microsecond resolution — (epoch micros)/1e6 as a plain NUMERIC
#: column, timezone-independent on the Spark side (sources/tables.py).
COLUMN_EXPR: dict[tuple[str, str], str] = {
    ("events", "ts"): "(CAST(epoch_us(ts) AS DOUBLE) / 1e6)",
}


def _src(table: str, col: str) -> str:
    return COLUMN_EXPR.get((table, col), col)


def _num_expr(table: str, col: str, ltype: str) -> str:
    """Numeric projection matching describe._numeric_value: DATE columns
    as epoch seconds (DuckDB epoch() = micros/1e6 in double, bit-identical
    to Spark's cast(ts as double))."""
    src = _src(table, col)
    return f"epoch({src})" if ltype == D else f"CAST({src} AS DOUBLE)"


#: Statistics that are sketch-derived in approx mode (HLL distinct and
#: its derivations; rank-sketch quantiles and their derivation). In the
#: banded approx contract the Spark side self-checks these against its
#: own exact computation and emits an 'ok' verdict; the oracle pins the
#: verdict (see describe_approx_sql / extensions_registry).
SKETCH_STATS = frozenset(
    {"distinct_count", "is_constant", "is_unique", "p_unique", "iqr"}
    | set(constants.QUANTILE_LABELS)
)


def describe_approx_sql(table: str) -> str:
    """Oracle twin for the BANDED approx describe: every statistic a
    sketch cannot reproduce exactly is pinned to the verdict 'ok' (the
    Spark query computes the verdict by checking its sketch output
    against exact values in the same plan — rank bands for quantiles,
    HLL error bands for distinct counts); every exactly-computable
    statistic (count, min/max, sum, mean, moments, mad, cv, zeros/inf)
    is hash-compared for real, exactly like exact-mode describe."""
    return describe_sql(table, banded_sketch=True)


def describe_sql(
    table: str,
    columns: list[str] | None = None,
    banded_sketch: bool = False,
    source_sql: str | None = None,
) -> str:
    """``source_sql`` substitutes the FROM source (e.g. a subquery
    appending a synthetic column) while ``table`` still keys the
    TABLE_TYPES entry describing the result's columns."""
    from_src = source_sql or table
    cols = TABLE_TYPES[table]
    if columns is not None:
        cols = [c for c in cols if c[0] in columns]

    agg_exprs = ["count(*) AS rows_"]
    mad_exprs = []
    for col, lt in cols:
        nv = _num_expr(table, col, lt)
        src = _src(table, col)
        agg_exprs.append(f"count({src}) AS {col}__count")
        if lt != U:
            agg_exprs.append(f"count(DISTINCT {src}) AS {col}__distinct")
        if lt in (N, D):
            agg_exprs += [f"min({nv}) AS {col}__min", f"max({nv}) AS {col}__max"]
            for lbl, p in _QLABEL.items():
                agg_exprs.append(
                    f"quantile_cont({nv}, {p}) AS {col}__q{int(p * 100)}"
                )
        if lt == N:
            agg_exprs += [
                f"avg({nv}) AS {col}__mean",
                f"stddev_samp({nv}) AS {col}__std",
                f"var_samp({nv}) AS {col}__variance",
                f"sum({nv}) AS {col}__sum",
                f"count_if(isinf({nv})) AS {col}__ninf",
                f"count_if({nv} = 0) AS {col}__nzeros",
            ]
            # mad + central moments need the mean first: second pass.
            # Explicit two-pass central moments (not DuckDB's built-in
            # skewness/kurtosis, which use naive power sums and lose
            # precision when mean >> std, e.g. epoch-second columns);
            # Spark's CentralMomentAgg is the stable streaming analogue.
            mu = f"(SELECT avg({nv}) FROM {from_src})"
            mad_exprs += [
                f"avg(abs({nv} - {mu})) AS {col}__mad",
                f"avg(pow({nv} - {mu}, 2)) AS {col}__m2",
                f"avg(pow({nv} - {mu}, 3)) AS {col}__m3",
                f"avg(pow({nv} - {mu}, 4)) AS {col}__m4",
            ]

    selects = []

    def row(col, stat, value_expr):
        if banded_sketch and stat in SKETCH_STATS:
            value_expr = "'ok'"
        selects.append(
            f"SELECT '{col}' AS col_name, '{stat}' AS statistic, {value_expr} AS value FROM agg"
        )

    for col, lt in cols:
        cnt = f"{col}__count"
        ct = f"CASE WHEN {cnt} = 0 THEN 'EMPTY' ELSE '{lt}' END"
        row(col, "content_type", ct)
        row(col, "count", fmt(cnt))
        row(col, "p_null", fmt(f"(rows_ - {cnt}) / rows_"))
        row(col, "n_null", fmt(f"rows_ - {cnt}"))
        if lt != U:
            nd = f"{col}__distinct"
            row(col, "distinct_count", fmt(nd))
            row(col, "is_constant", fmt(f"({nd} = 1)::INT"))
            row(col, "is_unique", fmt(f"({nd} = rows_)::INT"))
            row(col, "p_unique", fmt(f"{nd} / rows_"))
        if lt in (N, D):
            row(col, "min", fmt(f"{col}__min"))
            row(col, "max", fmt(f"{col}__max"))
            for lbl, p in _QLABEL.items():
                row(col, lbl, fmt(f"{col}__q{int(p * 100)}"))
        if lt == N:
            row(col, "mean", fmt(f"{col}__mean"))
            row(col, "std", fmt(f"{col}__std"))
            row(col, "variance", fmt(f"{col}__variance"))
            row(col, "iqr", fmt(f"{col}__q75 - {col}__q25"))
            n = f"CAST({col}__count AS DOUBLE)"
            g1 = f"({col}__m3 / pow({col}__m2, 1.5))"
            g2 = f"({col}__m4 / pow({col}__m2, 2) - 3)"
            row(
                col,
                "kurtosis",
                fmt(
                    f"CASE WHEN {n} >= 4 THEN ({n}-1)/(({n}-2)*({n}-3))"
                    f" * (({n}+1)*{g2} + 6) END"
                ),
            )
            row(
                col,
                "skewness",
                fmt(
                    f"CASE WHEN {n} >= 3 THEN {g1} * sqrt({n}*({n}-1))/({n}-2) END"
                ),
            )
            row(col, "sum", fmt(f"{col}__sum"))
            row(col, "mad", fmt(f"{col}__mad"))
            # Subnormal-mean guard — the identical expression as the
            # engine side (describe._cv_sql, CHANGES.md §7): cv is NULL
            # whenever |mean| sits below the column's summation noise
            # floor, so cross-engine sum-order differences can't flap
            # the hash between NULL and ±huge.
            noise = (
                f"CAST({col}__count AS DOUBLE) * 2.220446049250313e-16"
                f" * greatest(abs({col}__min), abs({col}__max))"
            )
            row(
                col,
                "cv",
                fmt(
                    f"CASE WHEN abs({col}__mean) <= {noise} THEN NULL"
                    f" ELSE {col}__std / {col}__mean END"
                ),
            )
            row(col, "p_infinite", fmt(f"{col}__ninf / rows_"))
            row(col, "n_infinite", fmt(f"{col}__ninf"))
            row(col, "n_zeros", fmt(f"{col}__nzeros"))
            row(col, "p_zeros", fmt(f"{col}__nzeros / rows_"))

    # MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, so
    # every UNION ALL branch below would re-run the full aggregate —
    # measured 725 s vs 0.75 s on lineitem at sf0.01.
    mad_cte = (
        f", mads AS MATERIALIZED (SELECT {', '.join(mad_exprs)} FROM {from_src})"
        if mad_exprs
        else ""
    )
    agg_src = "a, mads" if mad_exprs else "a"
    # Outer filter = E3, the reference's all-null row drop
    # (petk/exploration.py:164): a statistic undefined for the column
    # (e.g. quantiles of an all-null column) is a DROPPED row, not a
    # NULL-valued row — mirrored by the Spark queries' value-not-null
    # filter.
    return (
        f"WITH a AS MATERIALIZED (SELECT {', '.join(agg_exprs)} FROM {from_src})"
        f"{mad_cte}, agg AS MATERIALIZED (SELECT * FROM {agg_src}) "
        f"SELECT * FROM ({' UNION ALL '.join(selects)}) "
        f"WHERE value IS NOT NULL"
    )


def introduce_sql(table: str) -> str:
    cols = TABLE_TYPES[table]
    n_cols = len(cols)
    aggs = ["count(*) AS rows_"] + [
        f"count({_src(table, c)}) AS {c}__count" for c, _ in cols
    ]
    missing = " + ".join(f"(rows_ - {c}__count)" for c, _ in cols)

    selects = [
        f"SELECT 'basic' AS section, 'rows' AS metric, {fmt('rows_')} AS value FROM agg",
        f"SELECT 'basic', 'columns', {fmt(str(n_cols))} FROM agg",
        f"SELECT 'basic', 'observations', {fmt(f'rows_ * {n_cols}')} FROM agg",
        f"SELECT 'basic', 'missing_cells', {fmt(missing)} FROM agg",
    ]
    type_order = [
        constants.TYPE_BOOL, constants.TYPE_DATE, constants.TYPE_EMPTY,
        constants.TYPE_GEO, constants.TYPE_NUM, constants.TYPE_STR,
        constants.TYPE_UNSUPPORTED,
    ]
    for t in type_order:
        terms = []
        for c, lt in cols:
            terms.append(
                f"(CASE WHEN {c}__count = 0 THEN 'EMPTY' ELSE '{lt}' END = '{t}')::INT"
            )
        expr = " + ".join(terms)
        selects.append(
            f"SELECT 'columns', '{t}', {fmt(expr)} FROM agg WHERE ({expr}) > 0"
        )
    return (
        f"WITH agg AS MATERIALIZED (SELECT {', '.join(aggs)} FROM {table}) "
        + " UNION ALL ".join(selects)
    )
