"""The user-facing entry point: ``Report``.

Reference parity: petk/exploration.py:9-32 (``DataReport``). Differences
by design (SURVEY §3): construction is fully lazy — schema assertions run
on the driver against ``df.schema`` (no data touched), and null
canonicalization is composed as a projection instead of the reference's
eager destructive mutation (petk/exploration.py:27-29). Nothing executes
until ``describe``/``introduce``/``validate`` is acted upon.

Memoization (petk/exploration.py:73-75, 83-85): per-column describe
results and per-column validation results are cached on the report
object. Unlike the reference (acknowledged TODO petk/exploration.py:12),
the validation cache IS invalidated when the schema changes — the cache
key includes a hash of the column's rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petk_spark.nulls import canonicalize_nulls
from petk_spark.operators.describe import describe_frame, find_columns
from petk_spark.operators.introduce import introduce_frame
from petk_spark.operators.validate import validate_frame, verbose_violations


def _drop_all_null_rows(result: DataFrame, value_cols=None) -> DataFrame:
    """E3 — the reference drops result rows whose every value is null on
    every return (``results.dropna(how='all', axis=0)``,
    petk/exploration.py:164). The long-format equivalent: keep a row iff
    any VALUE column is non-null (label columns like ``column`` /
    ``statistic`` are the index in the reference's frame and don't count
    toward all-null)."""
    value_cols = value_cols or [
        c for c in ("value_num", "value_str") if c in result.columns
    ]
    pred = F.lit(False)
    for c in value_cols:
        pred = pred | F.col(c).isNotNull()
    return result.filter(pred)


class Report:
    def __init__(
        self,
        df: DataFrame,
        schema: dict | None = None,
        key: str | list[str] | None = None,
        exact: bool = True,
    ):
        schema = dict(schema or {})

        # A2 — schema keys must be existing columns (petk/exploration.py:19-20).
        for col in schema:
            assert col in df.columns, f"{col} is not a column in the data"

        # A3 — scalar 'nulls' promoted to a list (petk/exploration.py:22-25).
        for col, rules in schema.items():
            if rules and "nulls" in rules and not isinstance(rules["nulls"], list):
                rules["nulls"] = [rules["nulls"]]

        self.schema = schema
        self.key = key if key is not None else df.columns[0]
        self.exact = exact
        self.source = df
        # A4 — lazy canonical null projection (petk/exploration.py:27-29).
        self.df = canonicalize_nulls(df, schema)

        self._description: dict[tuple, list] = {}
        self._validation: dict[tuple, DataFrame] = {}
        self._persisted: list[DataFrame] = []

    # -- dataset summary ------------------------------------------------
    def introduce(self) -> DataFrame:
        return _drop_all_null_rows(introduce_frame(self.df))

    # -- per-column profile ---------------------------------------------
    def describe(self, columns=None, include_mad: bool = True) -> DataFrame:
        """Long-form stats for the requested columns. Cached per column:
        already-described columns are not recomputed (petk/exploration.py:73-75).
        Describe results are bounded (~40 stats/column), so caching collected
        rows on the driver is safe at any data scale — unlike validation,
        whose row-level results stay distributed (see ``validate``). The
        cache key includes ``include_mad``: a mad-less profile is not a
        valid answer for a mad-inclusive request."""
        cols = find_columns(self.df, columns)
        todo = [c for c in cols if (c, include_mad) not in self._description]
        if todo:
            computed = describe_frame(
                self.df, todo, exact=self.exact, include_mad=include_mad
            ).collect()
            for c in todo:
                self._description[(c, include_mad)] = [
                    r for r in computed if r["column"] == c
                ]
        rows = [r for c in cols for r in self._description[(c, include_mad)]]
        return _drop_all_null_rows(
            self.df.sparkSession.createDataFrame(
                rows,
                "column string, statistic string, value_num double, value_str string",
            )
        )

    def describe_plan(self, columns=None, include_mad: bool = True) -> DataFrame:
        """The uncached, fully-lazy describe plan (for composition/explain)."""
        return describe_frame(self.df, columns, exact=self.exact, include_mad=include_mad)

    # -- validation ------------------------------------------------------
    def validate(self, columns=None, verbose: bool = False) -> DataFrame:
        """Row-level violation table, fully lazy and distributed.

        Violations are unbounded (a fraction of the source rows), so they
        are NEVER collected to the driver. Memoization caches a persisted
        DataFrame per (column, rules-hash): the first action materializes
        the violation rows into executor storage; later ``validate`` calls
        — including schema-change invalidation via the rules hash — reuse
        those cached blocks instead of rescanning the source
        (petk/exploration.py:83-85 + the TODO at :12)."""
        cols = find_columns(self.df, columns)

        def rules_key(c):
            rules = self.schema.get(c) or {}
            return (c, repr(sorted((k, repr(v)) for k, v in rules.items())))

        todo = [c for c in cols if rules_key(c) not in self._validation]
        if todo:
            frame = validate_frame(
                self.df, self.schema, self.key, todo, ordered=False
            )
            if not self.df.isStreaming:
                frame = frame.persist()
                self._persisted.append(frame)
            for c in todo:
                self._validation[rules_key(c)] = frame.filter(
                    F.col("column") == F.lit(c)
                )
        parts = [self._validation[rules_key(c)] for c in cols]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if verbose:
            # Join the lazy frame straight back to the source; a global
            # sort before a join would be discarded by the shuffle anyway.
            return verbose_violations(self.df, out, self.key)
        return _drop_all_null_rows(
            out.orderBy("column", "row_key", "function"),
            value_cols=["notes"],
        )

    def unpersist(self) -> None:
        """Release the executor-storage blocks held by validation
        memoization (a long-lived Report on a shared cluster should free
        them when done)."""
        for frame in self._persisted:
            frame.unpersist()
        self._persisted.clear()

    def validate_plan(self, columns=None) -> DataFrame:
        """The uncached, fully-lazy unioned validation plan."""
        return validate_frame(self.df, self.schema, self.key, columns)

    # -- shaping ---------------------------------------------------------
    @staticmethod
    def as_dict(result: DataFrame, key_cols: list[str], value_cols=None) -> dict:
        """E2 — nest a (small) long result frame into dicts keyed by the
        given columns (petk/exploration.py:143-162). Driver-side: results
        are reports, not data."""
        rows = result.collect()
        value_cols = value_cols or [
            c for c in result.columns if c not in key_cols
        ]
        out: dict = {}
        for r in rows:
            node = out
            for k in key_cols[:-1]:
                node = node.setdefault(r[k], {})
            leaf = {c: r[c] for c in value_cols if r[c] is not None}
            if len(leaf) == 1:
                leaf = next(iter(leaf.values()))
            node[r[key_cols[-1]]] = leaf
        return out
