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


def epoch_order_key(key_cols, epoch: int) -> Column:
    """The deterministic per-epoch shuffle key: the 52-bit keyed
    uniform salted with the epoch number. Independent across epochs,
    identical across runs/engines/partitionings for one epoch."""
    return uniform_from_key(key_cols, salt=f"epoch:{epoch}")


def epoch_shuffle(
    df: DataFrame,
    key_cols: list[str],
    epoch: int,
    n_partitions: int | None = None,
    order_col: str = "epoch_order",
) -> DataFrame:
    """Deterministic GLOBAL training order for epoch ``epoch``: rows
    sorted by :func:`epoch_order_key` (ties broken by the key columns)
    across range partitions — partition i's every row precedes
    partition i+1's, so writing the partitions in order materializes
    one globally shuffled epoch, and each epoch is an independent
    permutation (new salt), the property data-order-matters training
    runs need (no epoch-to-epoch correlation).

    Scale shape: ONE range-partition exchange (sampled boundaries) +
    in-partition sort — the standard total-order plan; there is NO
    global window / single-reducer stage anywhere (use
    :func:`epoch_rank` only for audits). ``order_col`` keeps the sort
    key in the output so downstream writers can verify or re-sort."""
    u = epoch_order_key(key_cols, epoch)
    out = df.withColumn(order_col, u)
    parts = [F.col(order_col)] + [F.col(c) for c in key_cols]
    if n_partitions:
        out = out.repartitionByRange(n_partitions, *parts)
    else:
        out = out.repartitionByRange(*parts)
    return out.sortWithinPartitions(*parts)


def epoch_rank(
    df: DataFrame, key_cols: list[str], epoch: int
) -> DataFrame:
    """Audit/oracle shaping of :func:`epoch_shuffle`: ``(key...,
    rank)`` where rank is the row's 1-based position in the epoch's
    global order. A GLOBAL window (single reducer) — small-result
    audits and the driver twin only; production materializes order
    via :func:`epoch_shuffle`'s range exchange instead."""
    from pyspark.sql import Window

    u = epoch_order_key(key_cols, epoch)
    w = Window.orderBy(u, *[F.col(c) for c in key_cols])
    return df.select(
        *key_cols, F.row_number().over(w).cast("long").alias("rank")
    )


def take_token_budget(
    df: DataFrame,
    key_cols: list[str],
    tokens: Column,
    budget: int,
    salt: str = "",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic fixed-token-budget corpus selection: lay rows out
    in keyed-uniform order (a global deterministic shuffle) and keep
    the maximal prefix whose INCLUSIVE running token sum stays ≤
    ``budget`` — "give me a uniform 50B-token slice of this corpus",
    the sizing step between cleaning and tokenization. Take-while
    semantics: once the running sum crosses the budget every later row
    is dropped too, so the kept set is a contiguous prefix of the
    keyed order — re-runs, engines, and partitionings agree
    row-for-row, and (unlike rate-based sampling) the token mass is
    controlled directly.

    Scale shape — an EXACT global prefix sum in one shuffle: the keyed
    uniform is itself the range partitioner (``bucket = floor(u ×
    n_buckets)`` is order-preserving across buckets because u is
    uniform in [0,1)), the running sum inside each bucket is a plain
    window, and the cross-bucket offsets come from one
    ``n_buckets``-row aggregate joined back as a broadcast — a
    documented tiny collect (≤ ``n_buckets`` rows), never a global
    single-reducer window. Two passes over ``(key, tokens)``; the
    token column is usually precomputed by the profiling pass."""
    tok = F.coalesce(tokens.cast("long"), F.lit(0))
    u = uniform_from_key(key_cols, salt)
    base = df.withColumn("__u", u).withColumn(
        "__b", F.floor(F.col("__u") * n_buckets).cast("int")
    ).withColumn("__t", tok)
    spark = df.sparkSession
    totals = {
        r["__b"]: r["t"]
        for r in base.groupBy("__b").agg(F.sum("__t").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += totals[b]
    if not offsets:
        return df.filter(F.lit(False))
    off = spark.createDataFrame(offsets, "__b int, __off long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__b")
        .orderBy("__u", *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(off), "__b")
        .withColumn("__run", F.sum("__t").over(w) + F.col("__off"))
        .filter(F.col("__run") <= F.lit(int(budget)))
        .drop("__u", "__b", "__t", "__off", "__run")
    )
