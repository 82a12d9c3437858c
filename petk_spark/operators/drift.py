"""Profile drift between two table snapshots (SURVEY §2.F17).

The data-ops monitoring primitive: given yesterday's and today's frame
(or any two snapshots), report per-column statistic pairs so alerting
can threshold on the deltas. Complements describe(): this is the
two-sided comparison, describe() the one-sided profile.

Scale: one fused aggregate bundle per side (same single-scan shape as
describe's stats pass), the two 1-row results cross-joined broadcast —
no shuffle beyond the two aggregations, no driver collection. The
reshape to long form is a constant-size explode of the 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: statistic name → SQL aggregate template over the double-cast column.
_STATS = {
    "count": "count({v})",
    "n_null": "sum(CAST({c} IS NULL AS BIGINT))",
    "mean": "avg({v})",
    "std": "stddev_samp({v})",
    "vmin": "min({v})",
    "vmax": "max({v})",
}


def _bundle(df: DataFrame, columns, suffix: str) -> DataFrame:
    aggs = []
    for c in columns:
        v = f"CAST(`{c}` AS DOUBLE)"
        for stat, tpl in _STATS.items():
            aggs.append(
                tpl.format(v=v, c=f"`{c}`") + f" AS `{c}::{stat}::{suffix}`"
            )
    return df.agg(*[F.expr(a) for a in aggs])


def profile_drift(
    df_a: DataFrame, df_b: DataFrame, columns: list[str]
) -> DataFrame:
    """Long drift frame ``(col_name, statistic, value_a, value_b)`` for
    numeric ``columns`` over two snapshots. Values are doubles; callers
    threshold the deltas (the raw pair is returned rather than a derived
    delta so both absolute and relative alerting work downstream)."""
    one = _bundle(df_a, columns, "a").crossJoin(
        F.broadcast(_bundle(df_b, columns, "b"))
    )
    entries = []
    for c in columns:
        col_lit = c.replace("'", "\\'")
        for stat in _STATS:
            entries.append(
                "named_struct("
                f"'col_name', '{col_lit}', 'statistic', '{stat}', "
                f"'value_a', CAST(`{c}::{stat}::a` AS DOUBLE), "
                f"'value_b', CAST(`{c}::{stat}::b` AS DOUBLE))"
            )
    explode = "explode(array(" + ", ".join(entries) + ")) AS e"
    return one.select(F.expr(explode)).select("e.*")
