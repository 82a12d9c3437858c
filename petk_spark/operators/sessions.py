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
events concentrates on one reducer. That skew CANNOT be rescued at
runtime — AQE's skew splitting applies to joins only, never to window
partitions — so the mitigation is shipped as a key-design variant:
``sessionize(..., chunk_seconds=w)`` salts the window by time chunk
and stitches sessions across chunk boundaries with a per-(user, chunk)
summary pass, producing identical output with window partitions
bounded by events-per-(user, chunk) (equivalence property-tested under
a bot-user fixture in tests/test_skew.py).

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
    chunk_seconds: float | None = None,
) -> DataFrame:
    """Source rows + ``session_seq`` (1-based per user). ``ts_col`` is
    epoch seconds (numeric); NULL-ts rows are dropped (see module doc).

    ``chunk_seconds=None`` (default) is the single-window path: one
    shuffle on the user key, per-user window — the right plan when no
    single user's event count can overwhelm a reducer. Passing a chunk
    width switches to the SKEW-SAFE two-phase plan (see
    :func:`_sessionize_chunked`): identical output, window partitions
    bounded by events-per-(user, time-chunk) instead of
    events-per-user, which is the mitigation for bot users — AQE skew
    splitting only applies to joins, never to window partitions, so a
    hot user cannot be rescued at runtime and must be pre-split by
    key design."""
    df = df.filter(F.col(ts_col).isNotNull())
    if chunk_seconds is not None:
        return _sessionize_chunked(
            df, user_col, ts_col, float(gap_seconds), float(chunk_seconds)
        )
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


def _sessionize_chunked(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float,
    chunk_seconds: float,
) -> DataFrame:
    """Salted two-phase sessionize — the bot-user scale path.

    Phase 1 (local): salt by the TIME CHUNK ``floor(ts / chunk)`` and
    run the gap window per (user, chunk) — the window partition is
    bounded by one user's events in one chunk, so a bot with 10% of
    all events spreads over #chunks reducers instead of one.

    Phase 2 (stitch): one summary row per (user, chunk) — min/max ts
    and local session count. A per-user window over SUMMARIES (rows =
    non-empty chunks per user, time-bounded, not event-bounded)
    decides for each chunk boundary whether the first local session
    continues the previous chunk's last session (boundary gap ≤
    threshold; the lag over summaries naturally skips empty chunks, so
    any chunk width works — including chunks narrower than the gap),
    and a running offset renumbers local sessions globally:

        offset = Σ n_local(prev chunks) − Σ merge(≤ this chunk)
        session_seq = offset + local_seq

    Exactly equivalent to the single-window path (pinned by the
    equivalence property test in tests/test_skew.py): global session
    boundaries are gaps > threshold between consecutive events, local
    splits at chunk edges are rejoined iff the boundary gap says so.

    Plan: one shuffle of the events on (user, chunk); the summary
    aggregation reuses that partitioning, the stitch window shuffles
    only summary rows, and the join back is on the same (user, chunk)
    key — the heavy side moves once. The join back uses NULL-SAFE
    equality on the user key: windows and groupBy hash NULL keys into
    their own group, so the NULL-user partition sessionizes like any
    other user on the plain path — a null-unsafe equi-join here
    silently dropped those rows and broke the documented equivalence
    (round-6 advisory; pinned by NULL-user cases in
    tests/test_skew.py)."""
    bucket = F.floor(F.col(ts_col) / F.lit(chunk_seconds)).cast("long")
    ev = df.withColumn("__chunk", bucket)
    wl = Window.partitionBy(user_col, "__chunk").orderBy(ts_col)
    gap_open = (
        (F.col(ts_col) - F.lag(ts_col).over(wl)) > F.lit(gap_seconds)
    ).cast("int")
    runl = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = ev.withColumn(
        "__local_seq",
        F.coalesce(F.sum(F.coalesce(gap_open, F.lit(0))).over(runl), F.lit(0))
        + 1,
    )
    summ = ev.groupBy(user_col, "__chunk").agg(
        F.min(ts_col).alias("__cmin"),
        F.max(ts_col).alias("__cmax"),
        F.max("__local_seq").alias("__nloc"),
    )
    ws = Window.partitionBy(user_col).orderBy("__chunk")
    runs = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NULL lag (first non-empty chunk) → condition NULL → merge 0
    merge = F.when(
        (F.col("__cmin") - F.lag("__cmax").over(ws)) <= F.lit(gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    offsets = (
        summ.withColumn("__merge", merge)
        .withColumn(
            "__offset",
            F.sum("__nloc").over(runs) - F.col("__nloc")
            - F.sum("__merge").over(runs),
        )
        .select(user_col, "__chunk", "__offset")
    )
    e, o = ev.alias("__e"), offsets.alias("__o")
    joined = e.join(
        o,
        F.col(f"__e.`{user_col}`").eqNullSafe(F.col(f"__o.`{user_col}`"))
        & (F.col("__e.__chunk") == F.col("__o.__chunk")),
    )
    return joined.select(
        *[F.col(f"__e.`{c}`") for c in ev.columns],
        (F.col("__o.__offset") + F.col("__e.__local_seq")).alias(
            "session_seq"
        ),
    ).drop("__chunk", "__local_seq")


def session_profile(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    chunk_seconds: float | None = None,
) -> DataFrame:
    """One row per (user, session): event count, start/end, duration.
    ``chunk_seconds`` forwards to :func:`sessionize` (skew-safe
    two-phase plan)."""
    s = sessionize(df, user_col, ts_col, gap_seconds, chunk_seconds)
    return s.groupBy(
        F.col(user_col).alias("user_id"), "session_seq"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_sec"),
    )
