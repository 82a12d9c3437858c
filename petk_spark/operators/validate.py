"""Rule-based row-level data-quality validation — ``validate()``.

Reference parity: petk/exploration.py:80-126 + petk/validation.py. Each
rule lazily filters the source to its violating rows and projects
``(column, row_key, function, notes)``; all rules for all columns are
``unionByName``-ed into ONE plan so Catalyst shares the scan — a single
job regardless of rule count. Violations carry a deterministic row key
(user-designated key columns) instead of the reference's implicit pandas
index (SURVEY §1.1 — ``monotonically_increasing_id`` is not stable
across runs and would break oracle hashing).

Rule semantics pinned to the reference:
  * ``range`` (petk/validation.py:36-45 + tools.py:104-110): NULLs pass
    (NaN comparisons are falsy in pandas apply). Messages are exactly
    'Value is less than the lower bound' / 'Value is greater than the
    upper bound'. The reference's falsy-bound bug (``if lower and ...``
    disables a bound of 0) is FIXED here: only None/NaN disables a bound
    — the documented no-bound sentinel (reference README.md:49).
    Divergence recorded in CHANGES.md.
  * ``accepted`` (petk/validation.py:47-51): NULLs are FLAGGED — pandas
    ``~isin`` is True for NaN. Spark's ``isin`` returns NULL for NULL
    input, so the predicate ORs in ``isNull`` explicitly. Message:
    'Value not within the accepted range'.
  * unknown rule names are silently ignored (reflective dispatch,
    petk/exploration.py:88-91 — here an explicit registry, same
    ignore-unknown behavior). The ``nulls`` key is consumed by ingest
    canonicalization, not a rule.
  * geometry rules (bounding_box / geospatial / sliver) live in geo/ and
    are registered on import when shapely is available.

Scale: each rule is a predicate filter the Parquet scan can push down;
violations are expected to be a small fraction of rows, so the verbose
join-back (E1) broadcasts the violation side.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATION_COLUMNS = ["column", "row_key", "function", "notes"]

MSG_BELOW = "Value is less than the lower bound"
MSG_ABOVE = "Value is greater than the upper bound"
MSG_NOT_ACCEPTED = "Value not within the accepted range"


def row_key_expr(key) -> Column:
    """Deterministic row identity: one key column, or several concatenated
    with ':' (e.g. lineitem → 'l_orderkey:l_linenumber')."""
    if isinstance(key, str):
        key = [key]
    parts = [F.col(k).cast("string") for k in key]
    if len(parts) == 1:
        return parts[0]
    return F.concat_ws(":", *parts)


def _no_bound(b) -> bool:
    return b is None or (isinstance(b, float) and math.isnan(b))


def rule_range(df: DataFrame, column: str, key, bounds) -> DataFrame:
    assert len(bounds) == 2, "A lower and upper bound must be provided, use None/NaN if no bounds"
    lower, upper = bounds
    c = F.col(column)

    below = F.lit(False) if _no_bound(lower) else c < F.lit(lower)
    above = F.lit(False) if _no_bound(upper) else c > F.lit(upper)
    notes = F.when(below, F.lit(MSG_BELOW)).otherwise(F.lit(MSG_ABOVE))
    # NULLs pass: `c < lit` is NULL for NULL input and filter drops it.
    return df.filter(below | above).select(
        F.lit(column).alias("column"),
        row_key_expr(key).alias("row_key"),
        F.lit("range").alias("function"),
        notes.alias("notes"),
    )


def rule_accepted(df: DataFrame, column: str, key, values) -> DataFrame:
    c = F.col(column)
    pred = ~c.isin(list(values)) | c.isNull()
    return df.filter(pred).select(
        F.lit(column).alias("column"),
        row_key_expr(key).alias("row_key"),
        F.lit("accepted").alias("function"),
        F.lit(MSG_NOT_ACCEPTED).alias("notes"),
    )


def rule_pattern(df: DataFrame, column: str, key, pattern) -> DataFrame:
    """Beyond-reference rule (SURVEY §2.F): flag string values that do
    not match ``pattern`` (unanchored search in BOTH engines — anchor
    with ^...$ for a full-value match). NULLs pass — the rule validates the
    format of *present* values (range-style semantics, not
    accepted-style; presence is what the ``accepted``/``range`` null
    conventions already cover). Keep patterns in the Java∩RE2 common
    dialect (no backreferences/lookaround) so the DuckDB oracle runs the
    identical regex."""
    if isinstance(pattern, (list, tuple)):
        (pattern,) = pattern
    c = F.col(column)
    pred = c.isNotNull() & ~c.rlike(pattern)
    msg = f"Value does not match pattern '{pattern}'"
    return df.filter(pred).select(
        F.lit(column).alias("column"),
        row_key_expr(key).alias("row_key"),
        F.lit("pattern").alias("function"),
        F.lit(msg).alias("notes"),
    )


def rule_unique(df: DataFrame, column: str, key, params) -> DataFrame:
    """Beyond-reference rule (SURVEY §2.F): flag every row whose value
    occurs more than once in the column — the row-level complement of
    describe's ``is_unique`` boolean (which only says THAT duplicates
    exist, not WHERE). NULLs pass (presence is the null conventions'
    job); the message carries the duplicate count so triage can sort by
    severity. ``params`` accepts True / {} / [] — the rule takes no
    parameters.

    Scale shape: one count window hash-partitioned by the VALUE —
    groups are bounded by per-value multiplicity, and violations flow
    out without a driver round-trip, like every other rule. A column
    that is one giant duplicate concentrates its group on one reducer;
    that column is catastrophically non-unique and the right tool is
    describe's distinct_count, which is why the hazard is accepted."""
    from pyspark.sql import Window

    c = F.col(column)
    w = Window.partitionBy(c)
    return (
        df.filter(c.isNotNull())
        .withColumn("__dup_n", F.count(F.lit(1)).over(w))
        .filter(F.col("__dup_n") > 1)
        .select(
            F.lit(column).alias("column"),
            row_key_expr(key).alias("row_key"),
            F.lit("unique").alias("function"),
            F.concat(
                F.lit("Value occurs "), F.col("__dup_n").cast("string"),
                F.lit(" times"),
            ).alias("notes"),
        )
    )


#: Explicit rule registry replacing the reference's reflective dispatch
#: (petk/exploration.py:88-91). Geometry rules register on geo import.
RULE_REGISTRY = {
    "range": rule_range,
    "accepted": rule_accepted,
    "pattern": rule_pattern,
    "unique": rule_unique,
}


def validate_frame(
    df: DataFrame, schema: dict, key, columns=None, ordered: bool = True
) -> DataFrame:
    """Lazy unioned violation table ``(column, row_key, function, notes)``,
    ordered (column, row_key, function) like petk/exploration.py:116-124.
    ``ordered=False`` skips the global sort — callers that persist or join
    the frame (Report memoization, verbose) don't want to pay a full
    shuffle for an ordering the downstream plan discards."""
    from petk_spark import constants
    from petk_spark.logical_types import static_logical_type
    from petk_spark.operators.describe import find_columns

    requested = find_columns(df, columns)
    fields = {f.name: f for f in df.schema.fields}
    if any(
        static_logical_type(fields[c]) == constants.TYPE_GEO for c in requested
    ):
        # Geo rules live in an optional subpackage; importing it
        # registers bounding_box/geospatial/sliver BEFORE rule lookup.
        import petk_spark.geo  # noqa: F401

    GEO_RULE_NAMES = {"bounding_box", "geospatial", "sliver"}
    parts = []
    for col in requested:
        rules = schema.get(col) or {}
        if static_logical_type(fields[col]) == constants.TYPE_GEO:
            # All geometry rules for the column — including the implicit
            # validity audit (petk/exploration.py:95-99) — fuse into ONE
            # kernel pass so each geometry is parsed once, not per rule.
            from petk_spark.geo.rules import fused_geo_part

            geo_rules = {k: v for k, v in rules.items() if k in GEO_RULE_NAMES}
            parts.append(
                fused_geo_part(df, col, key, geo_rules, include_validity=True)
            )
            rules = {k: v for k, v in rules.items() if k not in GEO_RULE_NAMES}
        for rule_name, params in rules.items():
            impl = RULE_REGISTRY.get(rule_name)
            if impl is None or rule_name == "nulls":
                continue  # silently ignore unknown keys (reference parity)
            parts.append(impl(df, col, key, params))

    spark = df.sparkSession
    if not parts:
        return spark.createDataFrame(
            [], "column string, row_key string, function string, notes string"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if df.isStreaming or not ordered:
        # Streaming forbids global sort; violations flow unordered.
        return out
    return out.orderBy("column", "row_key", "function")


def verbose_violations(df: DataFrame, violations: DataFrame, key) -> DataFrame:
    """E1 — join violations back to the full original rows
    (petk/exploration.py:139-141). The violation side is broadcast: it is
    the small side by construction."""
    keyed = df.withColumn("row_key", row_key_expr(key))
    return keyed.join(F.broadcast(violations), on="row_key", how="inner")
