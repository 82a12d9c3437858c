"""Hash-stable formatting of floating-point results.

Spark and the DuckDB oracle compute doubles with different summation /
interpolation orders; raw bit-level hashes would flap on the last few
ulps. Every oracle-facing query therefore formats continuous values to
7 significant digits with C-style scientific notation ('%.6e').

Two-stage rounding: snap to 8 significant digits first ('%.7e' →
double), then format the snapped double to 7. Engine noise (different
summation order over up-to-millions of doubles) is ≤ ~1e-11 relative;
the stage-1 granularity of 1e-7 relative gives ~1e4 margin, so both
engines virtually always snap to the SAME 8-digit decimal, and stage 2
is then a deterministic function of that shared double. A single-stage
'%.6e' would flap: money-style data makes exact decimal ties at 7
digits COMMON (quantile interpolation of 2-decimal values lands on
e.g. 5422.2525, whose two nearest doubles format to 5.422252e+03 vs
5.422253e+03).

CRITICAL: the Spark side must NOT use JVM ``format_string`` — Java's
Formatter rounds from the double's *shortest decimal repr* with
HALF_UP, while C/DuckDB/Python round the *exact binary value* half-even.
On the decimal ties that stage 1 deliberately creates, those disagree.
The finite branch is therefore a vectorized pandas UDF using Python's
printf (verified bit-identical to DuckDB's across 5k adversarial
doubles; results are tiny post-aggregation frames, so the UDF is not in
the hot path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: printf pattern shared with the DuckDB oracle SQL.
SCI_FMT = "%.6e"
_STAGE1_FMT = "%.7e"


@F.pandas_udf(StringType())
def _c_sci(values: pd.Series) -> pd.Series:
    def one(x: float) -> str:
        return SCI_FMT % float(_STAGE1_FMT % x)

    return values.map(one, na_action="ignore")


def fmt_sci(col: Column) -> Column:
    """NULL-safe '%.6e' rendering; non-finite values get fixed tokens so
    engine formatting differences cannot diverge."""
    c = col.cast("double")
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(F.isnan(c), F.lit("NaN"))
        .when(c == float("inf"), F.lit("Infinity"))
        .when(c == float("-inf"), F.lit("-Infinity"))
        # Snap sub-1e-10 magnitudes to zero: cancellation noise around a
        # true zero (e.g. skewness of a uniform sequence) is absolute,
        # not relative, and must not flap the hash.
        .when(F.abs(c) < 1e-10, F.lit("0.000000e+00"))
        .otherwise(_c_sci(c))
    )


def duckdb_fmt_sci(expr: str) -> str:
    """The DuckDB-side twin of :func:`fmt_sci` for an SQL expression."""
    e = f"CAST(({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN ({e}) IS NULL THEN NULL "
        f"WHEN isnan({e}) THEN 'NaN' "
        f"WHEN ({e}) = 'infinity'::DOUBLE THEN 'Infinity' "
        f"WHEN ({e}) = '-infinity'::DOUBLE THEN '-Infinity' "
        f"WHEN abs({e}) < 1e-10 THEN '0.000000e+00' "
        f"ELSE printf('{SCI_FMT}', CAST(printf('{_STAGE1_FMT}', {e}) AS DOUBLE)) END"
    )
