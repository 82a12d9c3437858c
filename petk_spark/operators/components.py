"""Connected components over near-duplicate pair graphs — the cluster
step that turns pairwise near-dup detection into production dedup.

The pair operators (jaccard/minhash/simhash/embedding near-dup) emit
edges; a training-data pipeline needs one REPRESENTATIVE per duplicate
cluster, which is a connected-components problem: transitive closure of
"a is a near-dup of b". This module computes, fully distributed,
``(id, cluster_id)`` with ``cluster_id = min(id) of the component``,
plus the keep-first filter built on it.

Beyond-reference extension (the reference has no dedup at all —
absence: the whole petk/ tree); declared in SURVEY §2.F.

Algorithm: iterative min-label propagation. Each round every node
takes the min label among itself and its neighbors — one equi-join of
the label frame with the (bidirectional) edge list plus one min-agg,
i.e. two hash shuffles on ``id`` per round, map-side combined, no
driver data movement (the driver loop only checks a convergence COUNT
per round). Rounds needed = graph diameter; near-dup components are
dense (LSH bucket cliques glued by shared members), so diameters of 2-4
dominate and the loop exits fast. ``localCheckpoint`` every round cuts
the growing lineage so round N's plan doesn't replay rounds 1..N-1
(the classic iterative-Spark trap). A 100 TB-scale note: for graphs
with genuinely long chains, the two-phase large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) converges in O(log n) rounds with the same
join+min-agg building blocks; near-dup graphs don't need it, so this
implementation keeps the simpler round shape.

Determinism: labels are ids, min() is order-insensitive, iteration
count is data-dependent but the fixpoint is unique — the result is
engine-portable, and the DuckDB oracle replays it with a recursive CTE
(extensions_registry._SQL_NEAR_DUP_CLUSTERS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every node; cluster_id = component min id.

    ``nodes``: one row per node id (singletons allowed — they become
    their own cluster). ``edges``: undirected pair list (each pair once
    is enough; both directions are derived internally).

    Raises if the loop exhausts ``max_iterations`` before the labels
    reach a fixpoint (graph diameter > max_iterations): returning
    partially-propagated labels would be a silently wrong closure.
    """
    if nodes.isStreaming or edges.isStreaming:
        raise ValueError("connected_components requires batch frames")
    labels = nodes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(id_col).cast("long").alias("lbl"),
    )
    both = edges.select(
        F.col(src_col).cast("long").alias("u"), F.col(dst_col).cast("long").alias("v")
    ).unionByName(
        edges.select(
            F.col(dst_col).cast("long").alias("u"),
            F.col(src_col).cast("long").alias("v"),
        )
    )
    both = both.localCheckpoint(eager=False)

    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
                F.col("lbl"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("new_lbl") != F.col("lbl")).limit(1).count()
        labels = updated.select("id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the round budget) — raise "
            "max_iterations or switch to a large-star/small-star variant"
        )
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def near_dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(id, cluster_id) over ALL rows of ``df`` given a near-dup pair
    list from any of the pair operators; rows in no pair cluster to
    themselves."""
    nodes = df.select(F.col(id_col).alias("id")).distinct()
    return connected_components(nodes, pairs, "id", src_col, dst_col)


def dedup_near_keep_first(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Drop every near-duplicate except the minimum-id representative of
    its cluster — the linear-output production dedup (the pair list is
    quadratic in cluster size; the kept set is what a pipeline ships).
    One broadcast-or-shuffle join of df against the (id, cluster_id)
    labels."""
    clusters = near_dup_clusters(df, pairs, id_col)
    keep = clusters.filter(F.col("id") == F.col("cluster_id")).select("id")
    return df.join(
        keep.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
