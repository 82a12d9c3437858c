"""Distributed as-of (point-in-time) join — the canonical "custom
operator Spark lacks" (beyond-reference extension, SURVEY §2.F22).

``asof_join(left, right, ...)`` attaches to every left row the LATEST
right row of the same key whose time is ≤ the left row's time (LEFT
OUTER semantics: unmatched left rows keep NULL right fields).

Plan shape (100 TB): the naive formulation — a range join
``l.key = r.key AND r.t <= l.t`` + per-pair max — explodes to
O(|L|·|R| per key) intermediate rows. Instead, the classic distributed
as-of: UNION the two sides tagged by origin, ONE hash shuffle on the
key, then a per-key time-ordered window where the right side's payload
is carried forward with ``last(..., ignorenulls)``; finally keep the
left rows. Cost = one shuffle + one window pass over |L|+|R| rows,
bounded per key by that key's activity (the same bounded-group
contract as sessionization). No join node at all.

Determinism (oracle contract): within one key, rows sort by
``(time, origin, right-order column)`` — right rows sort BEFORE left
rows at equal time (ties are inclusive: a right row AT the left row's
time matches), and equal-time right rows resolve to the greatest
``r_ord`` value, so both engines converge on the identical match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_ord: str | None = None,
) -> DataFrame:
    """All columns of ``left`` plus ``right_cols`` (NULL when no right
    row at or before the left timestamp). ``right_ord`` breaks ties
    among equal-timestamp right rows (greatest wins); defaults to the
    first of ``right_cols``."""
    right_ord = right_ord or right_cols[0]
    lcols = left.columns

    from pyspark.sql import types as T

    # Guard rails (cheap, schema-only): the tie-break column is cast to
    # double for the union'd __ord slot, so a non-numeric/non-temporal
    # right_ord would silently become NULL and void the documented
    # greatest-ord determinism — reject it instead. Likewise a right
    # payload column that shadows a left column would produce duplicate
    # output names.
    ord_type = right.schema[right_ord].dataType
    if not isinstance(
        ord_type, (T.NumericType, T.TimestampType, T.TimestampNTZType)
    ):
        raise TypeError(
            f"right_ord {right_ord!r} must be numeric or timestamp for the "
            f"deterministic tie-break; got {ord_type.simpleString()} — "
            "project a numeric ordering column first"
        )
    clash = sorted(set(right_cols) & set(lcols))
    if clash:
        raise ValueError(
            f"right_cols collide with left columns: {clash}; alias the "
            "right payload before the join"
        )

    # Truly-NULL structs (not structs of null fields — last(ignorenulls)
    # must skip the other side's placeholder entirely).
    null_r = F.lit(None).cast(
        T.StructType(
            [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        )
    )
    null_l = F.lit(None).cast(
        T.StructType([T.StructField(c, left.schema[c].dataType) for c in lcols])
    )
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("double").alias("__t"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal time
        F.lit(None).cast("double").alias("__ord"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        null_r.alias("__r"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("double").alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_ord).cast("double").alias("__ord"),
        null_l.alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return carried.select(
        *[F.col(f"__l.`{c}`").alias(c) for c in lcols],
        *[F.col(f"__match.`{c}`").alias(c) for c in right_cols],
    )
