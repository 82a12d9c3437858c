"""Fuzzy string matching over a column's vocabulary (entity-resolution
primitive; beyond-reference extension, SURVEY §2.F23): pairs of DISTINCT
values within a Levenshtein edit-distance threshold.

Scale shape: match the VOCABULARY, not the rows — distinct values are
orders of magnitude fewer than rows for natural-language columns (64 vs
2000 even in the tiny fixture; categorical/name columns at 100 TB are
millions of distincts vs trillions of rows). Candidates come from a
prefix BLOCK equi-join (the classic blocking key), so the all-pairs
n² never materializes; ``levenshtein`` runs JVM-side on the blocked
candidates only.

Declared recall contract: pairs whose first ``block_chars`` characters
differ are not candidates (standard blocking tradeoff — e.g. a typo in
the first character is missed). Raise recall with ``block_chars=0``
(full cross of the vocab — only for small vocabularies) or by unioning
multiple block functions (prefix + suffix) upstream.

Determinism: edit distance is an integer and both engines implement
plain Levenshtein, so results hash-match the DuckDB twin exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    block_chars: int = 1,
) -> DataFrame:
    """(term_a, term_b, dist) with term_a < term_b, over the distinct
    normalized (lower/trim) non-empty values of ``text_col``."""
    vocab = (
        df.select(F.lower(F.trim(F.col(text_col))).alias("term"))
        .where((F.col("term").isNotNull()) & (F.col("term") != ""))
        .distinct()
    )
    if block_chars > 0:
        vocab = vocab.withColumn("block", F.substring("term", 1, block_chars))
        a = vocab.alias("a")
        b = vocab.alias("b")
        cand = a.join(b, "block").select(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
    else:
        a = vocab.select(F.col("term").alias("term_a"))
        b = vocab.select(F.col("term").alias("term_b"))
        cand = a.crossJoin(b)
    return (
        cand.filter(F.col("term_a") < F.col("term_b"))
        .withColumn("dist", F.levenshtein("term_a", "term_b"))
        .filter(F.col("dist") <= max_dist)
        .select("term_a", "term_b", "dist")
    )
