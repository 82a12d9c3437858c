"""F49 — distributed Lloyd k-means over an embedding column.

Beyond-reference operator (the 365-LoC reference has no vector ops at
all); the natural companion to the IVF index and SemDeDup surfaces,
which both consume a centroid list: ``sample_centroids``
(similarity.py) trains on a capped 10k driver sample, which is the
right cost/quality point for IVF bucketing, but curation-grade
clustering (DataComp/SemDeDup-style cluster-then-prune) wants
centroids trained on the FULL corpus. This module is that full-corpus
path, built for the 100 TB shape:

* **Per iteration: one scan, k-row shuffle.** Assignment reuses
  :func:`petk_spark.operators.similarity.ivf_assign` — a map-only
  projection (literal-centroid codegen for k ≤ 64, broadcast-numpy
  Arrow kernel beyond). The centroid update is a
  ``groupBy(centroid_id)`` over per-dimension column sums — Spark's
  hash aggregate computes map-side partial sums, so the shuffle
  carries at most ``k × n_partitions`` pre-aggregated rows of
  ``dim + 1`` doubles, never data rows. The driver collects exactly
  ``k`` rows per iteration (the same contract as MLlib's KMeans).
* **Deterministic and engine-replayable.** Init is the first ``k``
  well-formed vectors in ``(md5(id), id)`` order — a pure function of
  the data that any SQL engine can replay (same md5-keyed-order trick
  as operators/sampling.py). Updated centroids are rounded to
  ``round_decimals`` between iterations: double summation is
  merge-order-dependent at the last ulp, and an unrounded centroid
  would let that noise flip a downstream argmax; rounding at 1e-6
  absorbs ~1e-12 relative sum noise on both engines, making a fixed
  iteration count bit-replayable (the registry's ``km_*`` twin
  families replay two full iterations in DuckDB CTEs).
* **Semantics match the sampled trainer**: cosine assignment
  (tie → lower centroid id, malformed vectors → NULL cell, excluded
  from updates), arithmetic-mean update, empty cluster keeps its
  previous centroid.

Scale note: iterations are sequential by nature (Lloyd is a
fixed-point loop); the per-iteration cost is the floor for any
distributed k-means. For k > 64 the assignment switches to the Arrow
matmul path automatically — plan size stays O(1) in k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petk_spark.operators.similarity import _well_formed, ivf_assign

__all__ = ["kmeans_fit", "kmeans_assign", "deterministic_init"]


def _modal_dim(df: DataFrame, vec_col: str) -> int:
    """Modal vector length over a capped sample (same robustness rule
    as similarity.sample_centroids: one ragged row in 100 TB must not
    anchor the dimension)."""
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .limit(10_000)
        .groupBy("d")
        .count()
        .orderBy(F.col("count").desc(), F.col("d"))
        .limit(1)
        .collect()
    )
    if not rows:
        raise ValueError("no non-NULL vectors to infer dimension from")
    return rows[0]["d"]


def deterministic_init(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[float]]:
    """First ``k`` well-formed vectors in ``(md5(str(id)), id)`` order.

    A global sort-limit over a projected 2-column frame: Spark runs it
    as a TakeOrdered (per-partition top-k, then a k-row merge on the
    driver) — no full sort materializes. md5-keyed order is the repo's
    standard engine-portable pseudo-shuffle, so a DuckDB twin selects
    the identical seed rows.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if dim is None:
        dim = _modal_dim(df, vec_col)
    rows = (
        df.filter(_well_formed(F.col(vec_col), dim))
        .select(F.col(vec_col).cast("array<double>").alias("v"), F.col(id_col).alias("i"))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 2,
    init: list[list[float]] | None = None,
    round_decimals: int = 6,
    dim: int | None = None,
) -> tuple[list[list[float]], dict]:
    """Full-corpus Lloyd k-means; returns ``(centroids, info)``.

    ``info`` carries ``sizes`` (cluster populations from the LAST
    update step) and ``n_assigned``. Malformed vectors (NULL / ragged
    / zero-norm / non-finite) get NULL assignments and never touch the
    update — one bad row must not poison a centroid.

    Rounding contract: every updated coordinate is
    ``round(sum/count, round_decimals)`` — the determinism seam that
    makes the fixed-iteration run replayable across engines and across
    Spark's own nondeterministic partial-sum merge order (module
    docstring). Pass ``round_decimals=None`` to disable (single-engine
    use where last-ulp drift is acceptable).
    """
    if dim is None:
        dim = len(init[0]) if init else _modal_dim(df, vec_col)
    cents = (
        [list(map(float, c)) for c in init]
        if init is not None
        else deterministic_init(df, k, id_col, vec_col, dim=dim)
    )
    if not cents:
        return [], {"sizes": [], "n_assigned": 0}
    sizes: list[int] = [0] * len(cents)
    n_assigned = 0
    for _ in range(max(0, iterations)):
        asg = ivf_assign(df, cents, id_col=id_col, vec_col=vec_col)
        stats = (
            asg.filter(F.col("centroid_id").isNotNull())
            .select(
                "centroid_id",
                *[
                    F.element_at(F.col("vec").cast("array<double>"), i + 1).alias(f"x{i}")
                    for i in range(dim)
                ],
            )
            .groupBy("centroid_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col(f"x{i}")).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cid = {r["centroid_id"]: r for r in stats}
        new_cents: list[list[float]] = []
        sizes = []
        n_assigned = 0
        for ci, old in enumerate(cents):
            r = by_cid.get(ci)
            if r is None or r["n"] == 0:
                new_cents.append(old)  # empty cluster keeps its centroid
                sizes.append(0)
                continue
            n = r["n"]
            sizes.append(n)
            n_assigned += n
            coord = [r[f"s{i}"] / n for i in range(dim)]
            if round_decimals is not None:
                coord = [round(x, round_decimals) for x in coord]
            new_cents.append(coord)
        cents = new_cents
    return cents, {"sizes": sizes, "n_assigned": n_assigned}


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final cluster assignment ``(id, centroid_id)`` — one map-only
    scan via the shared :func:`ivf_assign` contract (tie → lower id,
    malformed → NULL)."""
    return ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col).select(
        "id", "centroid_id"
    )
