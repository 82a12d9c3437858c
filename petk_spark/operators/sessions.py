"""Gap-based sessionization of event streams (beyond-reference
extension, SURVEY §2.F): assign every event a per-user session id —
a new session starts when the gap to the user's previous event exceeds
``gap_seconds`` — and roll sessions up to one row each.

Plan shape (100 TB): ONE hash shuffle on the user key; the session
boundary is a lag-compare inside a per-user window and the session
index a running sum over the same window — both stay inside
whole-stage codegen, no Python. The window is bounded by ONE user's
event count (the same bounded-group contract as exact per-group
quantiles, SURVEY F15): a pathological single user with billions of
events concentrates on one reducer — pre-split such bots upstream
(e.g. filter or salt by day) before sessionizing.

Determinism: ties in the per-user ordering don't affect session
assignment (equal timestamps have gap 0, which never opens a session),
so the rollup is engine-portable and oracle-hashable. Rows with a NULL
timestamp are dropped up front: an unstamped event cannot be placed in
a session, and engines disagree on where NULLs sort in a window
(Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST), so keeping them
would make session assignment engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Source rows + ``session_seq`` (1-based per user). ``ts_col`` is
    epoch seconds (numeric); NULL-ts rows are dropped (see module doc)."""
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_open = (
        (F.col(ts_col) - F.lag(ts_col).over(w)) > F.lit(float(gap_seconds))
    ).cast("int")
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        "session_seq",
        (F.coalesce(F.sum(F.coalesce(gap_open, F.lit(0))).over(run), F.lit(0)) + 1),
    )


def session_profile(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """One row per (user, session): event count, start/end, duration."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(
        F.col(user_col).alias("user_id"), "session_seq"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_sec"),
    )
