"""Trained BPE tokenizer (operators/bpe.py, round 12 — F51): the
cross-engine contract's executable pins. The registry twin
(token_histogram families bpe_merge/bpe_enc) hash-pins Spark ≡ DuckDB
retraining + encode; THESE tests pin the intra-repo seams — fold ≡
plain-Python pass, driver tier ≡ distributed tier, kernel ≡ training
segmentation — and the semantics edge cases."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petk_spark.operators.bpe import (
    _train_driver,
    apply_merge_expr,
    bpe_encode,
    segment_word,
    segment_word_pass,
    train_bpe,
)

CORPUS = [
    ("low low low low low", 0),
    ("lower lower newest newest", 1),
    ("newest newest newest widest", 2),
    ("widest widest newest lowest", 3),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for t, i in CORPUS], "doc_id long, text string"
    )


def test_train_matches_hand_computation(corpus_df):
    """First merges on the classic Sennrich-style toy corpus are
    hand-checkable: 'low'×5 'lower'×2 'newest'×6 'widest'×3 'lowest'×1.
    Pair (e,s) occurs in newest(6) + widest(3) + lowest(1) = 10;
    (s,t) the same 10; tie → (e,s) wins on a ASC. Then (es,t) = 10."""
    merges, seg = train_bpe(corpus_df, "text", n_merges=3, min_count=2)
    seg.unpersist()
    assert [(a, b) for (_r, a, b, _c) in merges[:2]] == [
        ("e", "s"),
        ("es", "t"),
    ]
    assert merges[0][3] == 10 and merges[1][3] == 10


def test_min_count_early_stop(corpus_df):
    merges, seg = train_bpe(corpus_df, "text", n_merges=50, min_count=4)
    seg.unpersist()
    assert 0 < len(merges) < 50
    assert all(c >= 4 for (_r, _a, _b, c) in merges)


def test_driver_tier_equals_distributed_tier(corpus_df):
    m_drv, s1 = train_bpe(corpus_df, "text", n_merges=6, min_count=2)
    m_dst, s2 = train_bpe(
        corpus_df, "text", n_merges=6, min_count=2, driver_dict_rows=0
    )
    assert m_drv == m_dst
    seg1 = {r["word"]: r["syms"] for r in s1.collect()}
    seg2 = {r["word"]: r["syms"] for r in s2.collect()}
    s1.unpersist()
    s2.unpersist()
    assert seg1 == seg2


def test_kernel_matches_training_segmentation(corpus_df):
    """Rank-ordered single-pass encode reproduces the training
    segmentation exactly for every in-corpus word."""
    merges, seg = train_bpe(corpus_df, "text", n_merges=5, min_count=2)
    for r in seg.collect():
        assert segment_word(r["word"], merges) == list(r["syms"])
    seg.unpersist()


def test_encode_frame_and_unseen_words(corpus_df, spark):
    merges, seg = train_bpe(corpus_df, "text", n_merges=4, min_count=2)
    seg.unpersist()
    df = spark.createDataFrame(
        [(0, "newest unseenword"), (1, None), (2, "   ")],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    assert list(rows[0]["bpe_tokens"]) == (
        segment_word("newest", merges) + segment_word("unseenword", merges)
    )
    assert rows[0]["n_tokens_bpe"] == len(rows[0]["bpe_tokens"])
    assert rows[1]["n_tokens_bpe"] == 0 and list(rows[1]["bpe_tokens"]) == []
    assert rows[2]["n_tokens_bpe"] == 0


def test_encode_keep_columns(corpus_df):
    merges, seg = train_bpe(corpus_df, "text", n_merges=2, min_count=2)
    seg.unpersist()
    out = bpe_encode(corpus_df, "doc_id", "text", merges, keep_columns=True)
    assert out.columns == ["doc_id", "text", "n_tokens_bpe", "bpe_tokens"]
    r = out.filter(F.col("doc_id") == 0).collect()[0]
    assert r["text"] == CORPUS[0][0]
    assert r["n_tokens_bpe"] == len(r["bpe_tokens"])


SYMS = st.lists(st.sampled_from(["a", "b", "ab", "c"]), max_size=12)


@given(syms=SYMS, a=st.sampled_from(["a", "b", "ab"]),
       b=st.sampled_from(["a", "b", "c"]))
@settings(max_examples=60, deadline=None)
def test_single_pass_is_exhaustive(syms, a, b):
    """One left-to-right pass leaves no (a, b) adjacency — the merged
    symbol a||b is strictly longer than a, so it cannot re-trigger."""
    out = segment_word_pass(syms, a, b)
    assert (a, b) not in set(zip(out, out[1:]))
    assert "".join(out) == "".join(syms)


def test_fold_expr_matches_python_pass(spark):
    """The JVM expression fold ≡ segment_word_pass on adversarial
    sequences (overlaps, multi-char symbols, singletons)."""
    cases = [
        ["a", "a", "a"],
        ["a", "b", "a", "b"],
        ["a", "b", "b", "a", "b"],
        ["ab", "b", "a", "ab"],
        ["a"],
        [],
        ["b", "a"],
    ]
    rules = [("a", "b"), ("a", "a"), ("ab", "b")]
    rows = [(i, c) for i, c in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, syms array<string>")
    for a, b in rules:
        got = {
            r["i"]: list(r["s2"])
            for r in df.select(
                "i", apply_merge_expr(F.col("syms"), a, b).alias("s2")
            ).collect()
        }
        for i, c in rows:
            assert got[i] == segment_word_pass(c, a, b), (c, a, b)


def test_driver_loop_overlap_counting():
    """'aaa'×1 counts (a,a) twice (adjacent positions, overlapping),
    and the argmax tie-break is (cnt DESC, a ASC, b ASC)."""
    merges = _train_driver([("aaa", 2), ("bc", 2)], 2, 2)
    # (a,a) cnt 4 beats (b,c) cnt 2; then 'aa','a' adjacency cnt 2
    assert merges[0][1:] == ("a", "a", 4)
    assert merges[1][1:] == ("aa", "a", 2)


def test_distributed_tier_deep_vocab_bounded_time(spark):
    """R12 verdict #4: the incremental distributed tier must sustain a
    real merge budget — n_merges=256 on the documents fixture — in
    bounded time (the old loop re-ran the full dict explode+shuffle
    per round; the incremental loop is 3 small jobs/round: cached-P
    argmax, affected-only delta aggregate, map-only rewrite). The
    fixture's 31-word vocabulary exhausts at ~89 merges (every word
    collapses to one symbol), which also pins the P-empty stop path;
    the rules must equal the driver tier's exactly."""
    import time

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t0 = time.perf_counter()
    m_dst, seg = train_bpe(
        df, "text", n_merges=256, min_count=1, driver_dict_rows=0
    )
    dt = time.perf_counter() - t0
    seg.unpersist()
    assert len(m_dst) > 50                       # deep into the budget
    assert dt < 180.0, f"{len(m_dst)} rounds took {dt:.0f}s"
    m_drv, seg2 = train_bpe(df, "text", n_merges=256, min_count=1)
    assert {r["syms"].__len__() for r in seg2.collect()} == {1}  # exhausted
    seg2.unpersist()
    assert m_dst == m_drv


def test_train_bpe_thresholded_zipf(spark):
    """Round 14 (r13 verdict #6): the named 100 TB production path —
    driver-tier training over the top-k dict with a MEASURED pair-mass
    coverage contract. The coverage arithmetic is verified against an
    independent computation, the full-gate case is exact (coverage
    1.0, merges ≡ the untresholded driver tier), and the returned seg
    re-segments the WHOLE dict, not just the head."""
    import random

    from petk_spark.operators.bpe import (
        train_bpe,
        train_bpe_thresholded,
    )

    rng = random.Random(4)
    alphabet = "abcdefghij"
    words, seen = [], set()
    while len(words) < 400:
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(2, 8))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    counts = {w: max(1, 2000 // r) for r, w in enumerate(words, 1)}
    rows = [
        (r, ((" " + w) * n).strip())
        for r, (w, n) in enumerate(counts.items())
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    # (a) default gate ≫ dict: trivially full coverage, merges exact
    m_full, seg_full = train_bpe(df, "text", n_merges=6)
    m_gate, seg_gate, st = train_bpe_thresholded(df, "text", n_merges=6)
    assert st["coverage"] == 1.0
    assert st["n_words_kept"] == st["n_words_total"] == 400
    assert m_gate == m_full
    assert seg_gate.count() == 400

    # (b) a real threshold: coverage matches the independent math and
    # reflects Zipf head concentration
    m_t, seg_t, st_t = train_bpe_thresholded(
        df, "text", n_merges=6, top_words=100
    )
    order = sorted(
        ((n, w) for w, n in counts.items()), key=lambda t: (-t[0], t[1])
    )
    head = order[:100]
    want_kept = sum(n * (len(w) - 1) for n, w in head)
    want_total = sum(n * (len(w) - 1) for w, n in counts.items())
    assert st_t["pair_mass_kept"] == want_kept
    assert st_t["pair_mass_total"] == want_total
    assert st_t["coverage"] == want_kept / want_total
    assert 0.7 < st_t["coverage"] < 1.0
    # high-mass merge RULES agree with the full tier on this
    # head-heavy fixture; late low-count merges are legitimately
    # tail-sensitive (that is exactly the approximation the coverage
    # stat quantifies), so compare the head of the merge list
    assert [(r, a, b) for r, a, b, _ in m_t[:4]] == [
        (r, a, b) for r, a, b, _ in m_full[:4]
    ]
    # full-dict segmentation coverage: every word present
    assert seg_t.count() == 400
