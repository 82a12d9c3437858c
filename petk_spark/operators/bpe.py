"""Trained byte-pair-encoding tokenizer (SURVEY §2.F51) — the real
subword tokenizer the token-budget operators (F44) and token
histograms approximate with ``BPE_ISH_PATTERN``. Beyond-reference (no
counterpart in petk — the reference profiles frames, it never
tokenizes); the algorithm is the public BPE recipe of Sennrich et al.
(arXiv:1508.07909), re-based on Spark aggregations.

Design, at the 100 TB design point:

* **train** (:func:`train_bpe`) — the corpus is scanned ONCE into a
  distinct-word frequency dict (one hash shuffle on the word); every
  merge round thereafter touches only that dict (pair-count aggregate
  + a 1-row ``collect()`` argmax + an expression-fold rewrite), so
  training cost is ``1 corpus scan + n_merges dict-sized rounds`` —
  the dict is orders of magnitude smaller than the corpus (Heaps'
  law), and the driver only ever holds one ``(a, b, count)`` row per
  round plus the final merge list (``n_merges`` rows).
* **encode** (:func:`bpe_encode`) — map-only: the learned merge list
  rides in the Arrow kernel's closure (one broadcast-equivalent, like
  the unigram-LM vocab in operators/lm.py); the 100 TB corpus side is
  one scan, zero shuffles, with a per-batch word→segmentation memo so
  repeated words (the common case) pay one segmentation each.

Cross-engine contract (what makes the result engine-replayable):

* Words are the repo-wide tokenizer's output (ASCII-whitespace split
  of the lowered text, empties dropped — ≡ the oracle's _TOKS_CTE).
* A word's initial segmentation is its character sequence; merges
  never cross word boundaries (no end-of-word sentinel).
* Pair counts are ADJACENT-POSITION counts (overlapping occurrences
  each count: "aaa" contributes (a,a) twice), weighted by word
  frequency — exact integers.
* The winning pair each round is ``(count DESC, a ASC, b ASC)`` —
  binary string order, exact-integer counts, so the argmax is
  deterministic on every engine.
* Applying a merge is ONE exhaustive left-to-right non-overlapping
  pass, expressed as a left fold: append ``s``, except when the
  accumulator's last element is ``a`` and ``s == b``, replace it with
  ``a||b``. (One pass IS exhaustive for a single rule: the merged
  symbol ``a||b`` is strictly longer than ``a`` so it can never
  re-trigger the same rule; proven by the property test.)
* **Encoding applies the learned rules in rank order, one such pass
  per rule** ("rank-ordered single-pass" semantics). For any word
  that appeared in the training corpus this reproduces the training
  segmentation exactly; for unseen words it is the subword-nmt-style
  rule replay. (The min-rank-iterative variant used by some codecs
  differs only when two distinct merges produce the same symbol
  string — documented, not supported.)

The DuckDB oracle RETRAINS the model (n_merges unrolled CTE stages,
each pair-count → argmax → fold) and replays encoding as a
training-dict join — so a hash match pins the whole lifecycle:
tokenization, pair counting, tie-breaks, the fold, and the kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from petk_spark.operators.lm import _tokens


def apply_merge_expr(syms: Column, a: str, b: str) -> Column:
    """JVM-side exhaustive left-to-right single-rule application: the
    left fold of the cross-engine contract (≡ the oracle's
    ``list_reduce`` stage and :func:`segment_word`'s scan)."""
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent-pair frequency aggregate over a ``(word, n, syms)``
    segmentation frame → ``(a, b, cnt)``. Dict-sized: one hash
    shuffle on the pair."""
    pairs = seg.filter(F.size("syms") >= 2).select(
        "n",
        F.explode(
            F.zip_with(
                F.slice("syms", F.lit(1), F.size("syms") - 1),
                F.slice("syms", F.lit(2), F.size("syms") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))


def _has_pair_expr(syms: Column, a: str, b: str) -> Column:
    """True iff ``syms`` contains the adjacency (a, b) — the
    affected-word predicate of the incremental distributed trainer.
    Empty/singleton arrays are False (slice of an undersized array is
    empty, zip_with of empties is empty, exists over empty is
    False)."""
    return F.exists(
        F.zip_with(
            F.slice(syms, F.lit(1), F.size(syms) - 1),
            F.slice(syms, F.lit(2), F.size(syms) - 1),
            lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
        ),
        lambda v: v,
    )


def _pair_delta(aff: DataFrame, a: str, b: str) -> DataFrame:
    """Pair-count DELTA for one merge round over the affected words
    only: old-segmentation pairs at weight −n, post-merge pairs at
    +n, summed to ``(a, b, cnt)``. Same overlap-counting adjacency
    semantics as :func:`_pair_counts` (zip of the two shifted
    slices), so P + delta ≡ a full recount."""
    old = aff.select(
        (-F.col("n")).alias("n"), F.col("syms").alias("ss")
    )
    new = aff.select(
        F.col("n").alias("n"),
        apply_merge_expr(F.col("syms"), a, b).alias("ss"),
    )
    both = old.unionByName(new)
    pairs = both.filter(F.size("ss") >= 2).select(
        "n",
        F.explode(
            F.zip_with(
                F.slice("ss", F.lit(1), F.size("ss") - 1),
                F.slice("ss", F.lit(2), F.size("ss") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))


def word_frequency(
    df: DataFrame, text_col: str, split_cjk: bool = False
) -> DataFrame:
    """The one corpus pass of training: distinct-word frequencies
    ``(word, n)`` under the repo-wide tokenizer (``split_cjk`` is the
    round-13 non-spacing-script pre-tokenization — CJK chars become
    single-char "words", the byte/char-level BPE starting point)."""
    return (
        df.select(F.explode(_tokens(text_col, split_cjk)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _train_driver(
    words: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[int, str, str, int]]:
    """Driver-tier merge loop over a collected (word, n) dict — the
    SAME contract as the distributed loop (overlap-counting pair sums,
    (cnt DESC, a ASC, b ASC) argmax, single-pass fold), pinned
    equivalent by tests. Python's code-point string order ≡ Spark's
    and DuckDB's binary UTF-8 order (UTF-8 is order-preserving)."""
    seg = [(list(w), n) for w, n in words]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in seg:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + n
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, a, b, cnt))
        seg = [(segment_word_pass(syms, a, b), n) for syms, n in seg]
    return merges


def segment_word_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One exhaustive left-to-right pass of a single rule — the plain
    Python twin of :func:`apply_merge_expr`."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _segment_frame(
    seg: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Re-segment a ``(word, n, syms)`` frame from a learned merge
    list via the Arrow kernel (rank-ordered single-pass ≡ the
    training fold — the property-tested contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["syms"] = [segment_word(w, merges) for w in pdf["word"]]
            yield out

    return seg.mapInPandas(run, "word string, n long, syms array<string>")


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 2,
    driver_dict_rows: int = 65536,
    split_cjk: bool = False,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a corpus.

    CJK note (round 13): for non-spacing scripts the PLAIN tokenizer
    is already the right BPE pre-tokenization — a CJK run is one
    "word" and segmentation starts at chars, so merges are learned
    within the run. ``split_cjk=True`` pre-splits runs into
    single-char words, which have no intra-word pairs and therefore
    learn NO merges — use it only when the char stream itself is the
    wanted encoding (count-parity with the LM surface's split_cjk
    mode); pinned by tests/test_cjk.py.

    Returns ``(merges, seg)``: ``merges`` is ``[(rank, a, b, count), …]`` in
    learned order (possibly shorter than ``n_merges`` — training
    stops when the best pair's count drops below ``min_count``), and
    ``seg`` is the final ``(word, n, syms)`` training-dict
    segmentation (useful as an encode memo / vocab inspection).

    Scale: the corpus is read once (:func:`word_frequency`). When the
    distinct-word dict is small (≤ ``driver_dict_rows``, known from
    the materializing count), the merge loop runs DRIVER-SIDE over
    the collected dict — a size-gated tier like the dedup module's
    ``max_broadcast_rows`` brute-force tier, turning the per-merge
    Spark jobs into one bounded collect. Above the gate (round 13,
    r12 verdict #4), the merge loop maintains the pair-count state
    INCREMENTALLY: a merge of (a, b) only changes the pair profile of
    words containing that adjacency, so each round is three SMALL
    jobs — the argmax collect on the cached pair state, an
    affected-words-only delta aggregate folded into it, and the
    map-only segmentation rewrite — never the full dict explode +
    shuffle the pre-r13 loop paid per round. Both state frames are
    eagerly ``localCheckpoint``-ed every round (dict-sized writes;
    keeps the plan O(1) — the nested delta subplans otherwise
    overflow plan rendering within ~16 rounds). Measured: ~450 ms per
    round flat on local[8] at the test fixture; exact-equal to the
    driver tier by tests. For a true 32k-merge production vocab the
    per-round scheduling floor still dominates (~4 h at 450 ms) —
    the practical path there is the driver tier over a
    frequency-thresholded dict (Zipf: the top-65k words carry almost
    all pair mass), which the ``driver_dict_rows`` gate already
    expresses."""
    seg = word_frequency(df, text_col, split_cjk).select(
        "word",
        "n",
        F.filter(F.split("word", ""), lambda c: c != "").alias("syms"),
    )
    cur = seg.persist()
    n_words = cur.count()
    if n_words <= driver_dict_rows:
        words = [(r["word"], r["n"]) for r in cur.select("word", "n").collect()]
        merges = _train_driver(words, n_merges, min_count)
        # r12 advisory: the returned frame used to be a mapInPandas
        # over the persisted `cur`, so callers' seg.unpersist() never
        # reached the persisted dict and its blocks leaked for the
        # session. The dict is already ON the driver here — segment it
        # locally (same segment_word contract as the Arrow kernel) and
        # return a local relation with no tie to `cur`, then drop the
        # persisted blocks before returning.
        rows = [(w, n, segment_word(w, merges)) for w, n in words]
        cur.unpersist()
        return merges, df.sparkSession.createDataFrame(
            rows, "word string, n long, syms array<string>"
        )
    # Distributed tier (round 13, r12 verdict #4): INCREMENTAL
    # pair-count maintenance. The old loop re-ran the FULL dict
    # explode + pair shuffle every merge round; but a merge of (a, b)
    # only changes the pair profile of words that actually CONTAIN the
    # (a, b) adjacency, so the pair-count state P is maintained by a
    # delta aggregate over the affected words only:
    #   P' = Σ over (P ∪ {−n·pairs(old syms), +n·pairs(new syms) :
    #                affected words}),  cnt ≤ 0 rows dropped.
    # Per round: 3 small Spark jobs — the argmax collect on the
    # cached P, the delta+union aggregate (affected-only shuffle),
    # and the map-only rewrite materialization — none of them the
    # full-dict explode. Unpersist strictly AFTER the successor frame
    # is materialized, so an evicted cache never forces a recursive
    # lineage replay.
    merges: list[tuple[int, str, str, int]] = []
    P = _pair_counts(cur).persist()
    for rank in range(1, n_merges + 1):
        best = (
            P.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, cnt))
        has = _has_pair_expr(F.col("syms"), a, b)
        aff = cur.filter(has)
        delta = _pair_delta(aff, a, b)
        P2 = (
            P.unionByName(delta)
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") > 0)
        )
        nxt = cur.select(
            "word",
            "n",
            F.when(has, apply_merge_expr(F.col("syms"), a, b))
            .otherwise(F.col("syms"))
            .alias("syms"),
        )
        # localCheckpoint EVERY round: P's plan would otherwise
        # nest each round's delta subplan —
        # each carrying a deep fold expression — and the tree goes
        # superlinear within a handful of rounds (measured: a plan-
        # string stack overflow before round 16). Both frames are
        # dict-sized, so the block write is cheap and the plan stays
        # O(1) per round.
        P2 = P2.localCheckpoint(eager=True)
        nxt = nxt.localCheckpoint(eager=True)
        P.unpersist()
        cur.unpersist()
        P, cur = P2, nxt
    P.unpersist()
    return merges, cur


def train_bpe_thresholded(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 2,
    top_words: int = 65536,
    split_cjk: bool = False,
) -> tuple[list[tuple[int, str, str, int]], DataFrame, dict]:
    """The named 100 TB BPE production path (round 14 — r13 verdict
    #6): train the DRIVER tier over the ``top_words``
    highest-frequency words with a MEASURED coverage contract instead
    of the distributed tier's per-round scheduling floor (~450 ms ×
    32k merges ≈ 4 h of driver round-trips).

    Why this is sound: word frequencies are Zipf-distributed, and
    pair mass — Σ n·(|word|−1), the quantity merge selection ranks on
    — concentrates even harder in the head; the top-65k words of a
    web-scale corpus carry ≈99 %+ of it. Instead of asserting that as
    prose, this function MEASURES it on the actual corpus: ``stats``
    reports the kept pair-mass fraction, so a caller at any scale
    sees exactly how much tail the threshold dropped (log it; raise
    ``top_words`` if coverage is low — e.g. heavily multilingual
    corpora flatten the head).

    Scale: one corpus scan (:func:`word_frequency`), one distributed
    TopK (``TakeOrderedAndProject`` — never a full sort), one
    dict-mass aggregate, one bounded ``top_words``-row collect; the
    merge loop is then pure driver compute (sub-second for 8 merges,
    minutes — not hours — for 32k). The returned ``seg`` re-segments
    the FULL dict with the learned merges (map-only Arrow kernel), so
    encode coverage is not thresholded — only merge LEARNING is.

    Returns ``(merges, seg, stats)`` with ``stats`` keys
    ``n_words_total``, ``n_words_kept``, ``pair_mass_total``,
    ``pair_mass_kept``, ``coverage``."""
    seg_all = word_frequency(df, text_col, split_cjk).select(
        "word",
        "n",
        F.filter(F.split("word", ""), lambda c: c != "").alias("syms"),
    ).persist()
    totals = seg_all.agg(
        F.count("*").alias("n_words"),
        F.sum(
            F.col("n") * (F.length("word") - F.lit(1))
        ).alias("pair_mass"),
    ).collect()[0]
    head = [
        (r["word"], r["n"])
        for r in seg_all.select("word", "n")
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_words)
        .collect()
    ]
    kept_mass = sum(n * (len(w) - 1) for w, n in head)
    merges = _train_driver(head, n_merges, min_count)
    out = _segment_frame(seg_all.select("word", "n", "syms"), merges)
    # materialization note: out is lazy over the persisted seg_all;
    # localCheckpoint cuts the tie so we can unpersist here
    out = out.localCheckpoint(eager=True)
    seg_all.unpersist()
    total_mass = int(totals["pair_mass"] or 0)
    stats = {
        "n_words_total": int(totals["n_words"]),
        "n_words_kept": len(head),
        "pair_mass_total": total_mass,
        "pair_mass_kept": int(kept_mass),
        "coverage": (
            1.0 if total_mass == 0 else kept_mass / total_mass
        ),
    }
    return merges, out, stats


def segment_word(
    word: str, merges: list[tuple[int, str, str, int]]
) -> list[str]:
    """Plain-Python rank-ordered single-pass segmentation — the
    kernel's inner loop and the contract's executable spec (the
    property test pins it ≡ :func:`apply_merge_expr`)."""
    syms = list(word)
    for _rank, a, b, _cnt in merges:
        if len(syms) < 2:
            break
        syms = segment_word_pass(syms, a, b)
    return syms


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
    keep_columns: bool = False,
    split_cjk: bool = False,
) -> DataFrame:
    """Tokenize a corpus with a learned merge list. Returns
    ``(id, n_tokens_bpe, bpe_tokens)`` — or, with ``keep_columns``,
    the full input row plus those two (the pipeline-composition
    shape, like lm_bits_per_token's).

    Map-only Arrow kernel: the merge list lives in the task closure;
    a per-batch ``word → segmentation`` memo makes repeated words
    (Zipf's law: most of the corpus) one dict probe each."""
    from petk_spark.operators.lm import _py_splitter

    tokenize = _py_splitter(split_cjk)
    rules = [(r, a, b, c) for (r, a, b, c) in merges]

    def encode_text(t, memo):
        if t is None or (not isinstance(t, str) and pd.isna(t)):
            return 0, []
        toks: list[str] = []
        for w in tokenize(t):
            got = memo.get(w)
            if got is None:
                got = segment_word(w, rules)
                memo[w] = got
            toks.extend(got)
        return len(toks), toks

    if keep_columns:
        schema_str = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        schema = (
            f"{schema_str}, n_tokens_bpe long, bpe_tokens array<string>"
        )

        def run_keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            memo: dict[str, list[str]] = {}
            for pdf in batches:
                nt, tk = [], []
                for t in pdf[text_col]:
                    n, toks = encode_text(t, memo)
                    nt.append(n)
                    tk.append(toks)
                out = pdf.copy()
                out["n_tokens_bpe"] = pd.Series(nt, dtype="int64")
                out["bpe_tokens"] = tk
                yield out

        return df.mapInPandas(run_keep, schema)

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            nt, tk = [], []
            for t in pdf["_t"]:
                n, toks = encode_text(t, memo)
                nt.append(n)
                tk.append(toks)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_tokens_bpe": pd.Series(nt, dtype="int64"),
                    "bpe_tokens": tk,
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return src.mapInPandas(
        run, f"id {id_type}, n_tokens_bpe long, bpe_tokens array<string>"
    )
