"""Deterministic sampling for training-data pipelines.

The reference has no sampling surface (absence noted in SURVEY §2.F);
these are Spark-native extensions with a property batch pipelines need
that ``df.sample`` cannot give: the selected subset is a pure function
of the ROW KEY — identical across runs, engines, partitionings, and
cluster sizes, so a re-run (or a DuckDB audit) reproduces byte-identical
training subsets, and adding data never flips the keep/drop decision of
an existing row.

Mechanism: keep a row iff ``md5(salt || ':' || key) < threshold`` where
the threshold is the sampling rate rendered as a 32-hex-digit boundary.
md5's hex form is uniform, both Spark and DuckDB emit identical
lowercase hex, and the comparison is a plain string compare — fully
engine-portable, row-local (no shuffle), and O(1) per row. Rates are
quantized at float64 precision. Null key parts are rendered as '' (an
explicit coalesce, because Spark's concat_ws silently skips nulls while
SQL's ``||`` nulls out — the one cross-engine trap in this design).

Scale: a map-side filter composed directly over the scan; at 100 TB the
sample never materializes the unsampled remainder anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_threshold(rate: float) -> str:
    """32-hex-digit keep boundary for a rate in [0, 1]."""
    if rate <= 0.0:
        return "0" * 32
    if rate >= 1.0:
        return "g"  # lexicographically above every hex digest
    return format(int(rate * (1 << 128)), "032x")


def sample_key(key_cols, salt: str = "") -> Column:
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols
    ]
    return F.md5(F.concat_ws(":", F.lit(salt), *parts))


def deterministic_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """Keyed Bernoulli sample: each row's fate is a pure function of
    (salt, key). Change ``salt`` to draw an independent sample."""
    return df.filter(sample_key(key_cols, salt) < F.lit(rate_threshold(rate)))


def uniform_from_key(key_cols, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from the row key: the
    first 13 hex chars of the keyed md5 (52 bits — exactly a double's
    mantissa, so the division is lossless) over 2^52. Identical
    arithmetic exists in DuckDB (('0x' || substr(md5, 1, 13))::BIGINT),
    so comparisons against it are engine-portable bit-for-bit."""
    return F.conv(
        F.substring(sample_key(key_cols, salt), 1, 13), 16, 10
    ).cast("double") / F.lit(float(1 << 52))


def weighted_sample(
    df: DataFrame, key_cols: list[str], weight: Column, salt: str = ""
) -> DataFrame:
    """Per-row-probability Bernoulli sample: keep each row with
    probability equal to its own ``weight`` expression (clamped to
    [0, 1]) — e.g. quality-weighted corpus sampling where high-quality
    documents are kept preferentially but low-quality ones still
    contribute mass. Deterministic in (salt, key) like every sampler
    here: re-runs, engines, and partitionings agree row-for-row; adding
    data never flips an existing row's fate. Map-side filter, no
    shuffle, no state."""
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(uniform_from_key(key_cols, salt) < w)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. up/down-weighting sources
    in a training mix). Unlisted strata get ``default_rate``."""
    key_cols = key_cols or [strata_col]
    thr = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return df.filter(sample_key(key_cols, salt) < thr)


def assign_split(
    df: DataFrame,
    key_cols: list[str],
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic multi-way train/val/test assignment: adds
    ``split_col`` labeling each row by where its keyed uniform lands in
    the cumulative fraction intervals (dict order; fractions must sum
    to ~1). Pure function of (salt, key) — map-side projection, no
    shuffle, no state — so:

      * re-runs, engines, and partition layouts agree row-for-row;
      * all rows sharing a key (e.g. all chunks of one document) land
        in the SAME split — key on the document id to prevent
        train/test leakage through near-identical sibling rows;
      * appending data never moves an existing row between splits
        (the property periodic re-splits need).

    Change ``salt`` to draw an independent partition."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    u = uniform_from_key(key_cols, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
