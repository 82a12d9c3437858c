"""PII detection / redaction and URL-domain signals (SURVEY §2.F36 +
F38) — beyond-reference LLM-pipeline operators (no counterpart in
petk; the reference profiles data, a pre-training pipeline must also
scrub it).

Everything here is a row-local JVM regex expression
(``regexp_count`` / ``regexp_replace`` / ``regexp_extract_all``):
zero shuffles in detection and redaction, whole-stage codegen, no
Python in the hot path — a 100 TB scrub pass costs exactly one scan.
The only aggregations (``pii_report``, ``domain_frequency``) are
map-side-combinable counts over tiny key spaces (5 PII classes /
distinct domains).

Cross-engine contract: every pattern stays inside the Java∩RE2 regex
subset — character classes, bounded quantifiers, alternation, ``\\b``,
``\\d``, ``\\s``, capture groups; NO lookaround, NO backreferences —
so DuckDB (RE2) replays detection, redaction, and extraction
bit-identically for the driver oracle. Counting semantics are the
shared leftmost, non-overlapping scan both engines implement.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Canonical PII classes in REDACTION ORDER (longest/most-specific
#: first, so a credit card is not half-eaten by the phone rule). Each
#: entry: (class, pattern, placeholder). The patterns are deliberately
#: conservative US-centric heuristics — the point of the operator is
#: the distributed plumbing and the deterministic cross-engine
#: contract; a deployment swaps in its own (RE2-safe) pattern table.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CREDIT_CARD>",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\b\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        # octet-range alternation (0-255, no leading zeros) instead of
        # \d{1,3}: "999.999.999.999" and zero-padded version strings
        # no longer match (round-8 verdict #5). Longest-first
        # alternatives, each fixed-form, so Java and RE2 agree on
        # leftmost-first matching; still no lookaround, so a bare
        # "1.2.3.4" version string — textually a valid address —
        # remains a documented match.
        r"\b(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
        r"(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}\b",
        "<IPV4>",
    ),
]

PII_CLASSES = [c for c, _, _ in PII_PATTERNS]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts of ``text`` — one ``regexp_count``
    (JVM, codegen) per class. Classes are counted INDEPENDENTLY on the
    raw text (not sequentially on redacted text), so the counts are
    order-free and each is exactly what DuckDB's
    ``len(regexp_extract_all(...))`` returns."""
    return {
        cls: F.regexp_count(text, F.lit(pat)) for cls, pat, _ in PII_PATTERNS
    }


def pii_signals_frame(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document PII profile: ``(id, n_email, n_credit_card, n_ssn,
    n_phone, n_ipv4, n_pii, has_pii)``. NULL text yields NULL counts
    and NULL ``has_pii`` (unknown, not clean — the caller decides how
    to route undecodable rows). Single scan, zero shuffles."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in PII_CLASSES:
        total = counts[c] if total is None else total + counts[c]
    return df.select(
        F.col(id_col).alias("id"),
        *[counts[c].cast("long").alias(f"n_{c}") for c in PII_CLASSES],
        total.cast("long").alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    classes: list[str] | None = None,
) -> DataFrame:
    """Replace every PII match with its typed placeholder, applying
    the classes in the canonical :data:`PII_PATTERNS` order (specific
    before general, so ``<CREDIT_CARD>`` wins over the phone rule on
    overlapping digit runs). Redaction is IDEMPOTENT: placeholders
    contain no digits or ``@``, so a second pass matches nothing.
    ``classes`` restricts which classes are redacted (canonical order
    is kept regardless of the argument order). One projection, zero
    shuffles, NULL text passes through NULL."""
    out_col = out_col or text_col
    wanted = set(classes) if classes is not None else set(PII_CLASSES)
    unknown = wanted - set(PII_CLASSES)
    if unknown:
        raise ValueError(f"unknown PII classes: {sorted(unknown)}")
    expr = F.col(text_col)
    for cls, pat, placeholder in PII_PATTERNS:
        if cls in wanted:
            expr = F.regexp_replace(expr, pat, placeholder)
    return df.withColumn(out_col, expr)


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-level PII summary: one row per class —
    ``(class, n_docs, n_matches, p_docs)`` where ``n_docs`` counts
    documents with ≥1 match and ``p_docs`` is that count over the
    scanned (non-NULL text) document count. One scan + one 5-row
    aggregate: the per-class counts are computed wide (map-side
    partials) and unpivoted with the zero-shuffle struct-explode
    trick the introduce/null-canonicalization operators use."""
    counts = pii_counts(F.col(text_col))
    scanned = F.count(F.col(text_col))
    aggs = [scanned.alias("__n_docs_scanned")]
    for c in PII_CLASSES:
        aggs.append(
            F.sum((counts[c] > 0).cast("long")).alias(f"__docs_{c}")
        )
        aggs.append(F.sum(counts[c]).alias(f"__matches_{c}"))
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("class"),
            F.coalesce(F.col(f"__docs_{c}"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col(f"__matches_{c}"), F.lit(0)).alias(
                "n_matches"
            ),
            F.when(
                F.col("__n_docs_scanned") > 0,
                F.coalesce(F.col(f"__docs_{c}"), F.lit(0)).cast("double")
                / F.col("__n_docs_scanned"),
            ).alias("p_docs"),
        )
        for c in PII_CLASSES
    ]
    return wide.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.*"
    )


# ---------------------------------------------------------------------------
# URL / domain signals (F38)
# ---------------------------------------------------------------------------

#: URL matcher (Java∩RE2): scheme + non-space run. Group 1 captures
#: the host for domain extraction.
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)[^\s]*"


def url_signals_frame(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document URL profile: ``(id, n_urls, domains)`` where
    ``domains`` is the ordered list of matched hosts (lowercased,
    duplicates kept — the per-doc frequency IS signal). Row-local:
    ``regexp_count`` + ``regexp_extract_all(…, 1)``."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(t, F.lit(URL_PATTERN)).cast("long").alias("n_urls"),
        F.transform(
            F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(1)),
            lambda d: F.lower(d),
        ).alias("domains"),
    )


def domain_frequency(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus domain table: ``(domain, n_docs, n_urls)`` — the input
    to allowlist/blocklist curation. One explode + one hash aggregate
    on the domain (map-side combine absorbs the fan-out; the group
    count is the distinct-domain count, naturally bounded)."""
    per_doc = url_signals_frame(df, id_col, text_col)
    long = per_doc.select(
        "id", F.explode("domains").alias("domain")
    )
    return long.groupBy("domain").agg(
        F.count_distinct("id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
    )


def filter_by_domain_blocklist(
    df: DataFrame,
    text_col: str,
    blocklist: list[str],
) -> DataFrame:
    """Drop documents containing a URL whose host is (or ends with a
    dot-suffix of) a blocklisted domain — the standard source-quality
    gate. The blocklist is a driver-side literal folded into the plan
    (blocklists are small); matching is row-local, zero shuffles, and
    docs with no URLs pass. NULL text passes (no evidence to block)."""
    blocked = [b.lower() for b in blocklist]

    def _is_blocked(d: Column) -> Column:
        hit = F.lit(False)
        for b in blocked:
            hit = hit | (d == F.lit(b)) | d.endswith(F.lit("." + b))
        return hit

    domains = F.transform(
        F.regexp_extract_all(
            F.col(text_col), F.lit(URL_PATTERN), F.lit(1)
        ),
        lambda d: F.lower(d),
    )
    # NO join: the verdict is a row-local predicate on the same row's
    # text (exists() over an empty list is false; NULL text gives a
    # NULL match list → coalesce passes it).
    return df.filter(
        ~F.coalesce(F.exists(domains, _is_blocked), F.lit(False))
    )


# ---------------------------------------------------------------------------
# URL canonicalization (round 14, F60) — crawl dedup's other identity
# problem: the same page is referenced as HTTPS://WWW.X.COM:443/p?utm_
# source=a#top and https://x.com/p, so URL-keyed dedup, domain
# curation, and recrawl scheduling all need one canonical spelling.
# Same shared-table design as text._HTML_ENTITIES: ONE ordered rule
# list drives both the Spark expression chain and the generated DuckDB
# replay (they can only change together); every pattern is Java∩RE2
# (no lookaround, no backrefs in patterns).
# ---------------------------------------------------------------------------

#: scheme://authority — the case-insensitive half of a URL (RFC 3986
#: §6.2.2.1: scheme and host are case-insensitive, path/query are not)
_URL_HEAD_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

#: tracking query params stripped by default: the utm_* family plus
#: the unambiguous click-id params. Deliberately NOT the bare ``ref``
#: / ``ref_src`` names (round 15, ADVICE): on code/docs hosts
#: ``?ref=main`` selects a branch — stripping it would merge distinct
#: pages under URL-keyed dedup. Callers with a referral-heavy corpus
#: pass their own list via ``tracking_params=``.
_TRACKING_PARAMS: tuple[str, ...] = (
    "utm_[a-z0-9]+", "gclid", "fbclid", "igshid", "mc_cid", "mc_eid",
)


def _tracking_rule(params: Sequence[str]) -> tuple[str, str]:
    return (r"([?&])(" + "|".join(params) + r")=[^&]*", "$1")


def _url_canon_rules(
    tracking_params: Sequence[str] = _TRACKING_PARAMS,
) -> list[tuple[str, str]]:
    """Ordered rewrite rules applied AFTER fragment strip + head
    lowering — ONE table drives both the Spark chain and the DuckDB
    replay."""
    return [
        (r"^(https?://)www\.", "$1"),                 # drop www.
        (r"^(http://[^/?:]+):80([/?]|$)", "$1$2"),    # default port http
        (r"^(https://[^/?:]+):443([/?]|$)", "$1$2"),  # default port https
        _tracking_rule(tracking_params),
        (r"&&+", "&"),                                # separator debris
        (r"\?&", "?"),
        (r"[?&]+$", ""),                              # trailing ? / &
        (r"^(https?://[^/?]+)/$", "$1"),              # bare trailing slash
    ]


#: default-rule table (kept as a module constant for plan/doc audits)
_URL_CANON_RULES: list[tuple[str, str]] = _url_canon_rules()


def canonicalize_url(
    col: Column, tracking_params: Sequence[str] = _TRACKING_PARAMS
) -> Column:
    """Canonical URL spelling, entirely JVM-side (trim → fragment
    strip → lowercase scheme+host → the shared rule chain). Row-local,
    codegen-friendly; NULL → NULL. The identity to dedup/aggregate
    URLs on — compose with :func:`domain_frequency` or a keep-first
    window the same way text dedup keys on the text fingerprint.
    ``tracking_params`` overrides the default strip list (regex
    alternates, Java∩RE2 only)."""
    u = F.regexp_replace(F.trim(col), r"#.*$", "")
    head = F.regexp_extract(u, _URL_HEAD_PATTERN, 0)
    tail = F.regexp_replace(u, _URL_HEAD_PATTERN, "")
    u = F.concat(F.lower(head), tail)
    for pat, rep in _url_canon_rules(tracking_params):
        u = F.regexp_replace(u, pat, rep)
    return u


def duckdb_canonicalize_url(
    expr: str, tracking_params: Sequence[str] = _TRACKING_PARAMS
) -> str:
    """The oracle twin of :func:`canonicalize_url`: the SAME rule
    chain as a DuckDB SQL expression, generated from the same tables
    (RE2 spells group refs \\1 and needs the explicit 'g' flag)."""
    e = f"regexp_replace(trim({expr}), '#.*$', '', 'g')"
    e = (
        f"concat(lower(regexp_extract({e}, '{_URL_HEAD_PATTERN}')), "
        f"regexp_replace({e}, '{_URL_HEAD_PATTERN}', ''))"
    )
    for pat, rep in _url_canon_rules(tracking_params):
        rep_re2 = rep.replace("$1", "\\1").replace("$2", "\\2")
        e = f"regexp_replace({e}, '{pat}', '{rep_re2}', 'g')"
    return e
