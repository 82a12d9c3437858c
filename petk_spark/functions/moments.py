"""Sample-corrected moment statistics.

The reference reports pandas ``Series.skew()`` / ``Series.kurt()``
(petk/tools.py:59-60), which are the *sample-corrected* Fisher-Pearson
G1 and excess-kurtosis G2 estimators. Spark's built-in ``F.skewness`` /
``F.kurtosis`` are the *population* g1 / g2 (central-moment ratios with
1/n weights). The closed-form corrections below convert population to
sample estimators so the whole computation stays inside one JVM-side
aggregate — no second pass, no UDF:

    G1 = g1 * sqrt(n(n-1)) / (n-2)                      (n >= 3)
    G2 = (n-1)/((n-2)(n-3)) * ((n+1)*g2 + 6)            (n >= 4)

DuckDB's ``skewness``/``kurtosis`` aggregates are the same bias-corrected
estimators, which is what makes these oracle-checkable. For n below the
threshold pandas returns NaN; we return NULL (NaN ≡ NULL contract).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sample_skewness_g1(g1_pop: Column, n: Column) -> Column:
    n = n.cast("double")
    g1 = g1_pop * F.sqrt(n * (n - 1)) / (n - 2)
    return F.when(n >= 3, g1)


def sample_kurtosis_g2(g2_pop: Column, n: Column) -> Column:
    n = n.cast("double")
    g2 = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2_pop + 6)
    return F.when(n >= 4, g2)
