"""Dedup operator pins: the embedding near-dup size gate and the
banded hyperplane-LSH fallback's precision/recall contract."""

from __future__ import annotations

import pytest

from petk_spark.operators.dedup import embedding_near_dup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_embedding_near_dup_requires_integral_id(spark, emb):
    stringy = emb.selectExpr("CAST(vec_id AS STRING) AS vec_id", "embedding")
    with pytest.raises(TypeError, match="integral id"):
        embedding_near_dup(stringy, "vec_id", "embedding")


def test_fingerprint_overlap_short_and_null_docs(spark):
    """Docs shorter than the window fingerprint their whole token string
    (identical short docs pair); NULL text contributes nothing."""
    from petk_spark.operators.dedup import fingerprint_overlap

    df = spark.createDataFrame(
        [
            (1, "tiny doc"),
            (2, "Tiny   DOC"),   # same tokens after lower + \s+ split
            (3, "different"),
            (4, None),
        ],
        "id long, text string",
    )
    rows = fingerprint_overlap(df, "id", "text", window=8, min_common=1).collect()
    assert [(r.id_a, r.id_b, r.n_common) for r in rows] == [(1, 2, 1)]


def test_lsh_fallback_subset_and_recall(emb):
    """Above the broadcast ceiling the operator must switch to the
    bucketed LSH path: exact precision (every pair it returns is a true
    pair with the identical cosine) and S-curve recall (≥60% even at
    this deliberately LSH-hostile low threshold; ~99% at ≥0.9)."""
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4, max_broadcast_rows=1
        ).collect()
    }
    assert set(lsh) <= set(exact), "LSH returned a false pair"
    assert len(lsh) >= 0.6 * len(exact), (len(lsh), len(exact))
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k], rel=1e-9)
