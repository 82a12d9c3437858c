"""Unit tests for the PII / URL-domain (F36+F38) and paragraph
boilerplate (F37) operators, including DuckDB regex-parity checks for
every pattern the oracle twin replays."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from petk_spark.operators import paragraphs, pii


# ---------------------------------------------------------------------------
# PII detection
# ---------------------------------------------------------------------------

PII_DOC = (
    "Write to jane.doe+x@sub.example.co.uk or call (415)-555-0188; "
    "backup 212.555.0199 and 212-555-0199 both count. "
    "SSN 078-05-1120, card 4111-1111-1111-1111, host 10.0.254.3."
)


def test_pii_counts_crafted(spark):
    df = spark.createDataFrame(
        [(1, PII_DOC), (2, "no pii here at all"), (3, None)],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in pii.pii_signals_frame(df, "id", "text").collect()
    }
    r = rows[1]
    assert r["n_email"] == 1
    assert r["n_ssn"] == 1
    assert r["n_credit_card"] == 1
    # 10.0.254.3 only: 212.555.0199 has 3 groups, not 4, and the
    # credit card's 4-digit groups fail \d{1,3}\b
    assert r["n_ipv4"] == 1
    # (415)-555-0188, 212.555.0199 (dot separators), 212-555-0199;
    # the SSN's 2-digit middle group and the card's 4-digit groups
    # don't satisfy the 3-3-4 shape
    assert r["n_phone"] == 3
    assert r["n_pii"] == 7 and r["has_pii"] is True
    r2 = rows[2]
    assert r2["n_pii"] == 0 and r2["has_pii"] is False
    r3 = rows[3]
    assert r3["n_pii"] is None and r3["has_pii"] is None


def test_redaction_order_and_idempotence(spark):
    df = spark.createDataFrame([(1, PII_DOC)], "id long, text string")
    red = pii.redact_pii(df, "text", out_col="redacted")
    out = red.select("redacted").first()[0]
    assert "<EMAIL>" in out and "<SSN>" in out and "<PHONE>" in out
    assert "<CREDIT_CARD>" in out and "<IPV4>" in out
    # the credit card must be ONE placeholder, not phone fragments
    assert "4111" not in out and "078-05-1120" not in out
    # idempotence: a second pass changes nothing
    again = pii.redact_pii(red, "redacted", out_col="redacted2")
    r = again.select("redacted", "redacted2").first()
    assert r["redacted"] == r["redacted2"]


def test_redact_subset_classes(spark):
    df = spark.createDataFrame([(1, PII_DOC)], "id long, text string")
    out = (
        pii.redact_pii(df, "text", classes=["email"])
        .select("text")
        .first()[0]
    )
    assert "<EMAIL>" in out and "<SSN>" not in out
    with pytest.raises(ValueError, match="unknown PII classes"):
        pii.redact_pii(df, "text", classes=["passport"])


def test_pii_report_shares(spark):
    df = spark.createDataFrame(
        [(1, PII_DOC), (2, "clean"), (3, "a@b.io x"), (4, None)],
        "id long, text string",
    )
    rep = {
        r["class"]: r
        for r in pii.pii_report(df, "id", "text").collect()
    }
    assert set(rep) == set(pii.PII_CLASSES)
    assert rep["email"]["n_docs"] == 2
    assert rep["email"]["n_matches"] == 2
    # NULL-text doc is excluded from the denominator (3 scanned)
    assert rep["email"]["p_docs"] == pytest.approx(2 / 3)
    assert rep["ssn"]["n_docs"] == 1


def test_pii_patterns_match_duckdb_re2(spark):
    """Every pattern + placeholder replay bit-identically in DuckDB
    (RE2) — the exact seam the widened corpus_clean twin rides on."""
    texts = [
        PII_DOC,
        "edge: 1.2.3.4.5 and 999-99-9999 and x@y.z not-an-email@",
        "a@b.cd 0.0.0.0 (000) 000 0000 4000-0000-0000-0002",
        "",
    ]
    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for cls, pat, placeholder in pii.PII_PATTERNS:
        got = [
            r[0]
            for r in df.select(
                F.regexp_count("text", F.lit(pat))
            ).collect()
        ]
        want = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()[0]
            for t in texts
        ]
        assert got == want, f"count parity broke for {cls}"
        got_r = [
            r[0]
            for r in df.select(
                F.regexp_replace("text", pat, placeholder)
            ).collect()
        ]
        want_r = [
            con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')",
                [t, pat, placeholder],
            ).fetchone()[0]
            for t in texts
        ]
        assert got_r == want_r, f"replace parity broke for {cls}"


def test_ipv4_octet_range_false_positives(spark):
    """The octet-range alternation kills the \\d{1,3} false-positive
    class (round-8 verdict #5): out-of-range and zero-padded octets no
    longer match. A bare '1.2.3.4' version string is textually a valid
    address and REMAINS a match by documented design (no lookaround in
    the Java∩RE2 subset to disambiguate context)."""
    cases = [
        ("999.999.999.999", 0),        # out-of-range octets
        ("312.45.6.7", 0),             # first octet > 255
        ("256.1.1.1", 0),
        ("192.068.001.001", 0),        # zero-padded octets
        ("v1.2.3.4", 0),               # no word boundary after 'v1'
        ("1.2.3.4", 1),                # version-or-IP: match by design
        ("10.0.254.3", 1),
        ("0.0.0.0", 1),
        ("255.255.255.255", 1),
        ("ip 172.16.0.1 ok", 1),
        ("1.2.3.4.5", 1),              # leftmost 4 octets still match
    ]
    pat = dict((c, p) for c, p, _ in pii.PII_PATTERNS)["ipv4"]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", F.regexp_count("text", F.lit(pat)).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, (t, got[i], want)
        duck = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, pat]
        ).fetchone()[0]
        assert duck == want, ("duckdb", t, duck, want)


def test_pii_patterns_fuzz_parity_duckdb(spark):
    """Seeded fuzz over PII-shaped character soup: 300 strings built
    from digits, separators, '@', dots, letters and boundary
    characters, pushed through BOTH engines for every pattern (count
    AND replace). This is the widest practical net for a Java-vs-RE2
    semantic divergence (greediness, \\b at string edges, char-class
    quirks) — any mismatch here would eventually hit the driver hash
    via the corpus_clean twin."""
    import random

    rng = random.Random(8)
    alphabet = list("0123456789") * 4 + list(
        "-. ()@abcXYZ_%+\n\t/:"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    # salt with structured fragments at random offsets
    frags = [
        "a@b.co", "1.2.3.4", "123-45-6789", "(123) 456 7890",
        "4000-1111-2222-3333", "https://x.y", "@", "...", "---",
        "999-999-9999", "12.34.56.789", "0-0-0",
    ]
    for i in range(0, 300, 3):
        t = texts[i]
        k = rng.randint(0, len(t))
        texts[i] = t[:k] + rng.choice(frags) + t[k:]
    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for cls, pat, placeholder in pii.PII_PATTERNS:
        got = [
            (r[0], r[1])
            for r in df.select(
                F.regexp_count("text", F.lit(pat)),
                F.regexp_replace("text", pat, placeholder),
            ).collect()
        ]
        want = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?)),"
                " regexp_replace(?, ?, ?, 'g')",
                [t, pat, t, pat, placeholder],
            ).fetchone()
            for t in texts
        ]
        mism = [
            (t, g, tuple(w))
            for t, g, w in zip(texts, got, want)
            if g != tuple(w)
        ]
        assert not mism, f"{cls}: {mism[:3]}"


# ---------------------------------------------------------------------------
# URL / domain signals
# ---------------------------------------------------------------------------

def test_url_signals_and_domain_frequency(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://Docs.Example.com/a?q=1 and http://cdn.example.com/x"),
            (2, "plain text"),
            (3, "again https://docs.example.com/b"),
            (4, None),
        ],
        "id long, text string",
    )
    sig = {r["id"]: r for r in pii.url_signals_frame(df, "id", "text").collect()}
    assert sig[1]["n_urls"] == 2
    assert sig[1]["domains"] == ["docs.example.com", "cdn.example.com"]
    assert sig[2]["n_urls"] == 0 and sig[2]["domains"] == []
    assert sig[4]["domains"] is None
    freq = {
        r["domain"]: (r["n_docs"], r["n_urls"])
        for r in pii.domain_frequency(df, "id", "text").collect()
    }
    assert freq["docs.example.com"] == (2, 2)
    assert freq["cdn.example.com"] == (1, 1)


def test_domain_blocklist_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.bad.example/z"),
            (2, "https://bad.example/y"),
            (3, "https://good.example/ok and https://fine.org"),
            (4, "no urls"),
            (5, None),
        ],
        "id long, text string",
    )
    kept = sorted(
        r["id"]
        for r in pii.filter_by_domain_blocklist(
            df, "text", ["bad.example"]
        ).collect()
    )
    # exact match AND dot-suffix subdomain blocked; others pass,
    # including the no-URL and NULL-text docs
    assert kept == [3, 4, 5]


# ---------------------------------------------------------------------------
# paragraph boilerplate
# ---------------------------------------------------------------------------

BP = "SUBSCRIBE  to our\tnewsletter"  # normalization target
BP_VARIANT = "subscribe to our newsletter"  # same hash after normalize


def _mk_docs(spark):
    rows = [
        (1, f"intro one\n\n{BP}\n\nbody one"),
        (2, f"intro two\n\n{BP_VARIANT}\n\nbody two"),
        (3, f"{BP}\n\nbody three"),
        (4, BP),  # all boilerplate
        (5, "unique only"),
        (6, None),
        (7, "   "),  # whitespace-only: zero paragraphs
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_frame_positions_and_hashes(spark):
    df = _mk_docs(spark)
    pf = paragraphs.paragraph_frame(df, "doc_id", "text")
    rows = pf.filter(F.col("id") == 1).orderBy("pos").collect()
    assert [r["pos"] for r in rows] == [0, 1, 2]
    assert rows[0]["paragraph"] == "intro one"
    # normalization folds case/whitespace drift onto one hash
    h = {r["para_hash"] for r in pf.collect() if r["paragraph"] in (BP, BP_VARIANT)}
    assert len(h) == 1
    # NULL and whitespace-only docs contribute no rows
    assert pf.filter(F.col("id").isin(6, 7)).count() == 0


def test_paragraph_frequency(spark):
    df = _mk_docs(spark)
    freq = paragraphs.paragraph_frequency(df, "doc_id", "text")
    top = freq.orderBy(F.desc("n_docs")).first()
    assert top["n_docs"] == 4 and top["n_occurrences"] == 4


def test_remove_boilerplate(spark):
    df = _mk_docs(spark)
    out = {
        r["id"]: r
        for r in paragraphs.remove_boilerplate(
            df, "doc_id", "text", min_docs=3
        ).collect()
    }
    assert len(out) == 7  # every doc keeps a row
    assert out[1]["text"] == "intro one\n\nbody one"
    assert out[1]["n_paragraphs"] == 3 and out[1]["n_paragraphs_kept"] == 2
    assert out[2]["text"] == "intro two\n\nbody two"
    assert out[3]["text"] == "body three"
    # all-boilerplate doc: empty text, row preserved
    assert out[4]["text"] == "" and out[4]["n_paragraphs_kept"] == 0
    assert out[5]["text"] == "unique only"
    assert out[6]["text"] is None and out[6]["n_paragraphs"] == 0
    assert out[7]["text"] == "" and out[7]["n_paragraphs"] == 0


def test_remove_boilerplate_high_threshold_is_identityish(spark):
    """With an unreachable threshold nothing is removed: the rebuilt
    text equals the original up to separator canonicalization (the
    split/rejoin round-trip normalizes blank-line runs to one sep)."""
    df = _mk_docs(spark).filter(F.col("doc_id") == 1)
    out = paragraphs.remove_boilerplate(
        df, "doc_id", "text", min_docs=10_000
    ).first()
    assert out["text"] == f"intro one\n\n{BP}\n\nbody one"
    assert out["n_paragraphs"] == out["n_paragraphs_kept"] == 3


def test_remove_boilerplate_plan_shape(spark):
    """Scan economy is the operator's contract: the hot set joins back
    BROADCAST, and the whole rewrite costs TWO scans of the fat text
    column (frequency + marked rewrite) — or ONE when the hot set is
    precomputed."""
    df = _mk_docs(spark)
    plan = paragraphs.remove_boilerplate(
        df, "doc_id", "text", min_docs=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert plan.count("Scan ExistingRDD") <= 2  # createDataFrame source
    pre = spark.createDataFrame([("deadbeef",)], "para_hash string")
    plan1 = paragraphs.remove_boilerplate(
        df, "doc_id", "text", hot=pre
    )._jdf.queryExecution().executedPlan().toString()
    # precomputed hot set: the corpus appears exactly once
    assert plan1.count("Scan ExistingRDD") <= 2  # corpus + hot literal


def test_remove_boilerplate_precomputed_hot_matches_inline(spark):
    df = _mk_docs(spark)
    hot = paragraphs.paragraph_frequency(df, "doc_id", "text").filter(
        F.col("n_docs") >= 3
    )
    a = sorted(
        map(tuple, paragraphs.remove_boilerplate(
            df, "doc_id", "text", min_docs=3
        ).collect())
    )
    b = sorted(
        map(tuple, paragraphs.remove_boilerplate(
            df, "doc_id", "text", hot=hot
        ).collect())
    )
    assert a == b


def test_prepare_training_corpus_composition(spark):
    """The composed scrub+clean pass equals running the stages by
    hand, and its output text is the scrubbed (boilerplate-free,
    redacted) form."""
    from petk_spark.operators.pipeline import (
        corpus_clean, prepare_training_corpus,
    )

    base = "the data of a table is on the scan and it is a fast plan"
    rows = [
        # two docs identical after scrub (shared boiler + same body,
        # PII differs) -> one survives dedup
        (1, f"{base} a@b.co\n\nJOIN OUR LIST\n\nmore of the data"),
        (2, f"{base} z@q.io\n\nJOIN OUR LIST\n\nmore of the data"),
        (3, f"{base}\n\nJOIN OUR LIST"),
        (4, "JOIN OUR LIST"),  # all boilerplate -> empty -> filtered
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(
        df, "doc_id", "text", min_quality=0.1, boilerplate_min_docs=3
    )
    got = {r["id"]: r for r in out.collect()}
    # doc 1 wins the fingerprint window over doc 2 (lowest id)
    assert set(got) == {1, 3}
    assert "<EMAIL>" in got[1]["text"]
    assert "JOIN OUR LIST" not in got[1]["text"]
    # manual staging reproduces it
    from petk_spark.operators.paragraphs import remove_boilerplate
    from petk_spark.operators.pii import redact_pii

    manual = corpus_clean(
        redact_pii(
            remove_boilerplate(df, "doc_id", "text", min_docs=3)
            .select("id", "text"),
            "text",
        ),
        "id", "text", min_quality=0.1,
    )
    want = {r["id"]: r for r in manual.collect()}
    assert set(want) == set(got)
    for i in got:
        assert got[i]["fingerprint"] == want[i]["fingerprint"]
        assert got[i]["quality"] == want[i]["quality"]


def test_prepare_training_corpus_canonicalize_stage(spark):
    """Round 14 (r13 verdict #7): ``canonicalize=True`` runs F59's NFC
    + zero-width strip as stage 0, so composed and decomposed
    spellings of the same document fold to ONE kept row in the ACTUAL
    dedup pass — and the default keeps the old behavior (they stay
    distinct fingerprints)."""
    from petk_spark.operators.pipeline import prepare_training_corpus

    base = "the data of a table is on the scan and it is a fast plan"
    rows = [
        (1, base + " with a re\u0301sume\u0301 line"),  # decomposed
        (2, base + " with a r\u00e9sum\u00e9 line"),    # composed
        (3, base + " with a r\u00e9\u200bsum\u00e9 line"),  # zero-width
        (4, "a different document about the fast scan of the table"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.1, boilerplate_min_docs=None, redact=False)
    plain = prepare_training_corpus(df, "doc_id", "text", **kw)
    assert sorted(r["id"] for r in plain.collect()) == [1, 2, 3, 4]
    canon = prepare_training_corpus(
        df, "doc_id", "text", canonicalize=True, **kw
    )
    got = {r["id"]: r for r in canon.collect()}
    # keep-first: doc 1 wins the folded trio; text is canonical NFC
    assert sorted(got) == [1, 4]
    assert "r\u00e9sum\u00e9" in got[1]["text"]
    assert "\u0301" not in got[1]["text"]
    assert "\u200b" not in got[1]["text"]


def test_paragraph_split_parity_with_duckdb(spark):
    """The split regex + normalization + md5 replay identically in
    DuckDB — the seam the widened twin's boiler family rides on."""
    texts = [
        "a\n\nb", "a\n \t\n\n\nb\n\nc", "solo", "x\n\n\n", "\n\na",
        "win\r\n\r\ndows", "mixed\r\n \r\n\npara\r\nsame",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = [
        (r["id"], r["pos"], r["para_hash"])
        for r in paragraphs.paragraph_frame(df, "id", "text")
        .orderBy("id", "pos")
        .collect()
    ]
    con = duckdb.connect()
    want = []
    for i, t in enumerate(texts):
        pieces = con.execute(
            r"SELECT string_split_regex(?, '(?:\r?\n)[ \t]*(?:\r?\n)+')",
            [t],
        ).fetchone()[0]
        for pos, p in enumerate(pieces):
            if p.strip():
                h = con.execute(
                    r"SELECT md5(trim(regexp_replace(lower(?), '\s+', ' ', 'g')))",
                    [p],
                ).fetchone()[0]
                want.append((i, pos, h))
    assert got == want


@pytest.mark.parametrize("method", [None, "expr"])
def test_dedupe_lines_within_doc(spark, method):
    rows = [
        (1, "alpha\nbeta\nAlpha  \ngamma\nbeta\nalpha"),
        (2, "x\n\n\nx\n\ny"),   # blank lines exempt, dup x dropped
        (3, "only"),
        (4, None),
        (5, ""),
        # tab-only line folds onto the earlier blank's "" normalized
        # form (non-blank under the space-only trim) — both paths
        (6, "a\n \n\t\na"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in paragraphs.dedupe_lines(
            df, "doc_id", "text", method=method
        ).collect()
    }
    # normalization folds 'Alpha  ' onto 'alpha'; first form survives
    assert out[1]["text"] == "alpha\nbeta\ngamma"
    assert out[1]["n_lines"] == 6 and out[1]["n_lines_kept"] == 3
    # blank lines all kept (layout), second 'x' dropped
    assert out[2]["text"] == "x\n\n\n\ny"
    assert out[2]["n_lines"] == 6 and out[2]["n_lines_kept"] == 5
    assert out[3]["text"] == "only"
    assert out[4]["text"] is None and out[4]["n_lines"] == 0
    assert out[5]["text"] == "" and out[5]["n_lines"] == 1
    assert out[6]["text"] == "a\n "
    assert out[6]["n_lines"] == 4 and out[6]["n_lines_kept"] == 2


@pytest.mark.parametrize("method", [None, "expr"])
def test_dedupe_lines_row_local_plan(spark, method):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = paragraphs.dedupe_lines(
        df, "doc_id", "text", method=method
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles on BOTH paths


def test_dedupe_lines_arrow_equiv_expr(spark):
    """Pair equivalence of the O(L) Arrow kernel and the O(L²) oracle
    fold on the hostile known-value set (dups, case/space drift,
    blanks, tab-only lines, NULL, empty, trailing separators,
    string ids)."""
    texts = [
        "a\nA\nb\n a \nc\nb", "x\n\nx\n\nX", "q", "", None,
        "dup\ndup\ndup", "a\n \n\t\na", "end\n", "\nstart",
        " \n \n ", "Tab\there\nTAB  HERE",
    ]
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        "id string, text string",
    )
    arrow = {
        r["id"]: (r["text"], r["n_lines"], r["n_lines_kept"])
        for r in paragraphs.dedupe_lines(df, "id", "text").collect()
    }
    expr = {
        r["id"]: (r["text"], r["n_lines"], r["n_lines_kept"])
        for r in paragraphs.dedupe_lines(
            df, "id", "text", method="expr"
        ).collect()
    }
    assert arrow == expr


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=" \tabAB\n\r.|xyz0",
                max_size=80,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_dedupe_lines_arrow_equiv_expr_property(spark, texts):
    """Hypothesis: fold ≡ arrow on arbitrary docs over a hostile
    alphabet (whitespace variants, CR, regex metachars)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    a = sorted(
        paragraphs.dedupe_lines(df, "id", "text").collect()
    )
    e = sorted(
        paragraphs.dedupe_lines(df, "id", "text", method="expr").collect()
    )
    assert a == e


def test_dedupe_lines_literal_separator(spark):
    """A separator carrying regex metacharacters splits LITERALLY on
    both paths (round-8 advisory: F.split treats it as a regex while
    array_join rejoins literally — now quoted)."""
    df = spark.createDataFrame(
        [(1, "a|b|a|c"), (2, "q.r.q")], "id long, text string"
    )
    for method in (None, "expr"):
        out = {
            r["id"]: r
            for r in paragraphs.dedupe_lines(
                df, "id", "text", sep="|", method=method
            ).collect()
        }
        assert out[1]["text"] == "a|b|c"
        assert out[1]["n_lines"] == 4 and out[1]["n_lines_kept"] == 3
        # '.' is not the separator: doc 2 is ONE line under sep='|'
        assert out[2]["text"] == "q.r.q" and out[2]["n_lines"] == 1
    dot = {
        r["id"]: r
        for r in paragraphs.dedupe_lines(
            df, "id", "text", sep=".", method="expr"
        ).collect()
    }
    assert dot[2]["text"] == "q.r" and dot[2]["n_lines"] == 3


def test_dedupe_lines_long_doc_bounded_time(spark):
    """The production path is O(L) per document: a 50k-line document
    (mostly repeats — the scraped-log shape the operator targets)
    completes in seconds. The O(L²) fold demonstrably cannot (~10⁹
    interpreted compares), which is why it is the oracle contract
    only (round-8 verdict #1)."""
    import time

    line_pool = [f"status line {i % 37} ok" for i in range(50_000)]
    doc = "\n".join(line_pool)
    df = spark.createDataFrame([(1, doc)], "id long, text string")
    t0 = time.monotonic()
    row = paragraphs.dedupe_lines(df, "id", "text").collect()[0]
    elapsed = time.monotonic() - t0
    assert row["n_lines"] == 50_000 and row["n_lines_kept"] == 37
    assert elapsed < 60, f"arrow path took {elapsed:.1f}s on 50k lines"


@pytest.mark.parametrize("method", [None, "expr"])
def test_dedupe_lines_parity_with_duckdb(spark, method):
    """first-occurrence keep test replays via DuckDB list_position
    with the identical normalization — the seam the twin family
    rides on (BOTH physical paths against the SQL replay)."""
    texts = [
        "a\nA\nb\n a \nc\nb", "x\n\nx\n\nX", "q", "", "dup\ndup\ndup",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: (r["text"], r["n_lines"], r["n_lines_kept"])
        for r in paragraphs.dedupe_lines(
            df, "id", "text", method=method
        ).collect()
    }
    con = duckdb.connect()
    sql = r"""
    WITH t AS (SELECT i, string_split(txt, chr(10)) AS ls FROM
               (SELECT unnest(range(5)) AS i, unnest(?) AS txt)),
    n AS (SELECT i, ls,
          list_transform(ls, x -> trim(regexp_replace(lower(x), '\s+', ' ', 'g'))) AS nm
          FROM t)
    SELECT i,
      array_to_string(list_filter(ls, (x, k) -> trim(x) = '' OR list_position(nm, nm[k]) = k), chr(10)),
      len(ls), len(list_filter(ls, (x, k) -> trim(x) = '' OR list_position(nm, nm[k]) = k))
    FROM n ORDER BY i
    """
    for i, txt, nl, nk in [
        (r[0], r[1], r[2], r[3])
        for r in con.execute(sql, [texts]).fetchall()
    ]:
        assert got[i] == (txt, nl, nk), (i, got[i], (txt, nl, nk))


def test_corpus_clean_twin_round9_families_nonempty(spark):
    """Round-9 twin widening guard: a family that silently returns
    ZERO rows would still hash-match an equally-empty oracle — pin
    that `prep` (the composed prepare_training_corpus) and `xml_rt`
    (the write→read_xml round trip) actually produce rows, that the
    xml family covers the exact customer slice, and that the sentinel
    canonicalization path is genuinely exercised (BUILDING → NULL)."""
    from petk_spark.operators.extensions_registry import _q_corpus_clean

    sf = "/root/testdata/sf0.001"
    fam = (
        _q_corpus_clean(spark, sf)
        .groupBy("family")
        .count()
        .collect()
    )
    counts = {r["family"]: r["count"] for r in fam}
    assert counts.get("prep", 0) >= 1, counts
    slice_n = (
        spark.read.parquet(f"{sf}/customer.parquet")
        .filter(F.col("c_custkey") % 10 == 3)
        .count()
    )
    assert counts.get("xml_rt") == slice_n, (counts, slice_n)
    xml = (
        _q_corpus_clean(spark, sf)
        .filter(F.col("family") == "xml_rt")
        .collect()
    )
    segs = {r["k4"] for r in xml}
    assert "BUILDING" not in segs
    # prep really ran all three stages: its kept set must be a subset
    # of the document ids and its k4 differ from the boiler_clean md5
    # for at least one shared id (redaction changed the bytes for the
    # PII-carrying docs).
    prep = {
        r["k1"]: r["k4"]
        for r in _q_corpus_clean(spark, sf)
        .filter(F.col("family") == "prep")
        .collect()
    }
    boiler = {
        r["k1"]: r["k4"]
        for r in _q_corpus_clean(spark, sf)
        .filter(F.col("family") == "boiler_clean")
        .collect()
    }
    assert set(prep) <= set(boiler)
    pii_docs = [k for k in prep if int(k) % 4 == 0]
    assert pii_docs, "no PII-carrying doc survived the filters"
    assert any(prep[k] != boiler[k] for k in pii_docs)


def test_prepare_training_corpus_optional_stages(spark):
    """Round 9: the opt-in span-dedup (F41) and LM-filter (F46) stages
    compose into prepare_training_corpus without changing the default
    three-stage contract; composed ≡ hand-staged for the five-stage
    form; the LM stage scores in-band (no join-back node)."""
    from petk_spark.operators import lm as lm_mod
    from petk_spark.operators.pipeline import prepare_training_corpus
    from petk_spark.operators.spans import remove_repeated_spans

    span = "the quick brown fox jumps over the lazy dog again and again"
    # doc-unique tokens every few words so the ONLY 8-token windows
    # shared across documents are the ones inside the spliced span
    rows = [
        (
            i,
            f"the doc{i} is here and the part{i} has text "
            f"{span} so the tail{i} goes with more and the "
            f"story{i} ends here with the words{i} for quality",
        )
        for i in range(1, 9)
    ] + [(9, None), (10, "zz qq xx " * 10)]
    df = spark.createDataFrame(rows, "id long, text string")

    # defaults byte-identical to the round-8 contract
    base = prepare_training_corpus(df, "id", "text", min_quality=0.0,
                                   boilerplate_min_docs=100)
    base5 = prepare_training_corpus(
        df, "id", "text", min_quality=0.0, boilerplate_min_docs=100,
        span_dedup_min_docs=None, lm=None,
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, base5.collect())
    )

    vocab, stats = lm_mod.train_unigram_lm(df, "text", vocab_size=40)
    composed = prepare_training_corpus(
        df, "id", "text", min_quality=0.0, boilerplate_min_docs=100,
        span_dedup_min_docs=2,
        lm=vocab, lm_oov_logp=stats["oov_logp"], max_bits_per_token=9.0,
    )
    got = {r["id"]: r for r in composed.collect()}
    # the shared span is cut from every surviving text
    assert got, "composition must keep something"
    assert all("quick brown fox" not in r["text"] for r in got.values())
    assert all(r["bits_per_token"] <= 9.0 for r in got.values())
    # hand-staged equivalence: boiler(off) -> redact -> span -> clean -> lm
    from petk_spark.operators.pii import redact_pii

    staged = redact_pii(
        df.select(F.col("id"), F.col("text")), "text"
    )
    staged = remove_repeated_spans(
        staged, "id", "text", window=8, min_docs=2
    ).select("id", "text")
    from petk_spark.operators.pipeline import corpus_clean

    cc = corpus_clean(staged, "id", "text", min_quality=0.0)
    want_ids = {r["id"] for r in cc.collect()}
    lm_scores = {
        r["id"]: r["bits_per_token"]
        for r in lm_mod.lm_bits_per_token(
            staged, "id", "text", vocab, stats["oov_logp"]
        ).collect()
    }
    want = {
        i for i in want_ids
        if lm_scores[i] is not None and lm_scores[i] <= 9.0
    }
    assert set(got) == want
    # LM gate rejects a partially-specified stage
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prepare_training_corpus(df, "id", "text", lm=vocab)


def test_canonicalize_url_rules(spark):
    """Round 14 (F60): the canonical URL spelling — case-insensitive
    half lowered, fragment/default-port/www/tracking-params stripped,
    separator debris cleaned — and cross-engine parity of the
    generated DuckDB twin (the url_canon family's seam)."""
    from petk_spark.operators.pii import (
        canonicalize_url,
        duckdb_canonicalize_url,
    )

    cases = [
        ("HTTPS://WWW.Example.COM:443/Path/9/?utm_source=f&id=9"
         "&utm_campaign=X&ref=tw#Frag",
         "https://example.com/Path/9/?id=9&ref=tw"),
        ("http://Site.ORG:80/a?b=1", "http://site.org/a?b=1"),
        ("https://x.com/", "https://x.com"),
        ("http://x.com/?utm_a=1&utm_b=2", "http://x.com"),
        # non-default port and path case PRESERVED
        ("https://x.com:8443/Keep:Port", "https://x.com:8443/Keep:Port"),
        ("  http://WWW.a.b/Q?gclid=z&q=UP#x  ", "http://a.b/Q?q=UP"),
        # round 15 (ADVICE): bare ref/ref_src are IDENTIFYING on some
        # hosts (?ref=main branch selectors) — preserved by default,
        # strippable via tracking_params=
        ("https://x.com/p?ref=a&ref_src=b&keep=1",
         "https://x.com/p?ref=a&ref_src=b&keep=1"),
        # http on 443 / https on 80: NOT default, preserved
        ("http://x.com:443/a", "http://x.com:443/a"),
        ("not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("u")).alias("c")
        ).collect()
    }
    for i, (src, want) in enumerate(cases):
        assert got[i] == want, (src, got[i], want)
    # NULL passes through
    ndf = spark.createDataFrame([(0, None)], "i long, u string")
    assert ndf.select(
        canonicalize_url(F.col("u")).alias("c")
    ).collect()[0]["c"] is None
    # DuckDB twin: byte-for-byte parity on every case
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{c}')" for i, (c, _) in enumerate(cases))
        + ") v(i, u)"
    )
    want_d = dict(
        con.execute(
            f"SELECT i, {duckdb_canonicalize_url('u')} FROM t"
        ).fetchall()
    )
    for i in range(len(cases)):
        assert got[i] == want_d[i], (i, got[i], want_d[i])
    # caller-supplied tracking_params: an affiliate-heavy corpus CAN
    # strip ref — the list is an argument, not a fork of the table
    custom = ("utm_[a-z0-9]+", "ref", "ref_src")
    from petk_spark.operators.pii import (
        canonicalize_url as _cu,
        duckdb_canonicalize_url as _dcu,
    )

    got_c = df.filter(F.col("i") == 6).select(
        _cu(F.col("u"), tracking_params=custom).alias("c")
    ).collect()[0]["c"]
    assert got_c == "https://x.com/p?keep=1"
    want_c = con.execute(
        f"SELECT {_dcu('u', tracking_params=custom)} FROM t WHERE i=6"
    ).fetchone()[0]
    assert got_c == want_c
