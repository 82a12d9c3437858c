"""Oracle twins under PERTURBED fixtures — the defense against the
driver's testdata-regeneration pattern (the recurring env-drift seam,
see tests/test_aa_env_smoke.py): every round the driver may rewrite
the parquet tables, so a twin that only matches because of an
accidental fixture property (ASCII-only text, no NULLs, sorted ids,
gap-free id sequence) is a latent red row. This suite copies sf0.001,
appends adversarial documents rows (safe non-ASCII, empty string, NULL
text, whitespace-only, a very long doc, an id far outside the dense
range), shuffles row order, and re-runs a cross-section of
document-table twins through the SAME compare the driver uses.

'Safe' non-ASCII: characters whose lower() agrees across JVM, Python,
and DuckDB (é, ü, ñ, 中文). The known Turkish-İ / sharp-s divergences
are a documented engine-semantics ASSUMPTION (operators/text.py), not
a bug — they are deliberately not planted here.
"""

from __future__ import annotations

import shutil

import pytest

import __spark_entry__ as entrymod
from tests.driver_replica import strict_compare
from tests.oracle_harness import duck_connection

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Document-table twins most exposed to text/id fixture properties.
QUERIES = [
    "fingerprint_documents",
    "token_histogram",
    "chunk_pack_sequences",
    "corpus_clean",
    "media_metadata",
    "quality_weighted_sample",
    "near_dup_jaccard",
    # both components algorithms against the recursive fixpoint under
    # unicode/empty/NULL/duplicate docs (round 5)
    "near_dup_clusters",
    # round-6 consolidations: repetition signals (NULL text, unicode,
    # whitespace-only lines) and the split-label 52-bit arithmetic
    "text_quality_lang",
    "stratified_sample",
    # round-9 consolidations: span removal / decon families (unicode,
    # NULL, empty, whitespace-only, 5000-token and duplicate docs) and
    # the seen_filter anti-join's NULL-text keep contract
    "fingerprint_overlap",
    "dedup_exact_report",
]

EXTRA_DOCS = [
    # (doc_id, text, lang, source, n_chars) — ids beyond the dense range
    (10_000_019, "Café déjà vu — naïve ünïcode ñandú 中文 текст", "fr", "web", 44),
    (10_000_020, "", "en", "web", 0),
    (10_000_021, None, "en", "web", None),
    (10_000_022, "   \t  ", "en", "books", 6),
    (10_000_023, "tok " * 5000, "en", "books", 20000),
    (10_000_024, "duplicate duplicate duplicate duplicate duplicate", "en", "web", 49),
]


@pytest.fixture(scope="module")
def perturbed_dir(tmp_path_factory):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("perturbed")
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    base = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    extra = pd.DataFrame(
        EXTRA_DOCS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    both = pd.concat([base, extra], ignore_index=True)
    # deterministic order scramble — regeneration rarely preserves order
    both = both.iloc[
        sorted(range(len(both)), key=lambda i: (i * 2654435761) % 1000003)
    ].reset_index(drop=True)
    both["doc_id"] = both["doc_id"].astype("int64")
    both["n_chars"] = both["n_chars"].astype("Int64")
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(both, schema=schema, preserve_index=False),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", QUERIES)
def test_twin_holds_on_perturbed_fixture(spark, perturbed_dir, name):
    q = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(perturbed_dir)
    try:
        ok, detail = strict_compare(q[name](spark, perturbed_dir), con, osql[name])
        assert ok, f"{name} diverged on perturbed fixture: {detail}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# events-table twins — the actual victims of past regeneration drift
# ---------------------------------------------------------------------------

EVENT_QUERIES = [
    "sessionize_events",
    "completeness_over_time",
    "asof_join_events",
    "json_field_profile",
    "grouped_windowed_profile",
    "describe_events",
    # exact + KLL rank-band per hostile group (round 5)
    "grouped_quantiles",
]


@pytest.fixture(scope="module")
def perturbed_events_dir(tmp_path_factory):
    """sf0.001 with an adversarial events table: shuffled order, a
    purchase with NULL value (exercises the as-of struct carry), NULL
    props, same-instant same-user ties, exact hour-boundary timestamps,
    a new single-event user, and .999999 microsecond edges."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("perturbed_events")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    base = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    T = dt.datetime(2024, 3, 1, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    extra = pd.DataFrame(
        [
            # purchase with NULL value for an EXISTING active user
            (900001, T, 13, "purchase", None, '{"k": 1}'),
            # same instant, same user, non-purchase — inclusive match +
            # tie-break at equal timestamps
            (900002, T, 13, "click", 5.0, None),
            # second purchase at the SAME instant, same user — ord
            # tie-break between right rows
            (900003, T, 13, "purchase", 7.5, '{"k": 2}'),
            # exact hour boundary (completeness bucket edge)
            (900004, dt.datetime(2024, 3, 1, 13, 0, 0), 13, "view", 1.0, None),
            # microsecond .999999 edge just under the boundary
            (900005, dt.datetime(2024, 3, 1, 12, 59, 59, 999999), 13, "view", 2.0, '{"k": 3}'),
            # brand-new user with a single event (degenerate session)
            (900006, T + 12345678 * us, 777777, "signup", 0.5, '{"k": 4}'),
            # JSON edges: malformed, non-numeric field, absent field,
            # NULL props, scientific-notation number — the first two
            # caught a real ANSI-cast crash and a DuckDB-throws
            # divergence when introduced (round 4)
            (900007, T, 14, "click", 1.0, "{bad json"),
            (900008, T, 15, "click", 1.0, '{"k": "notnum"}'),
            (900009, T, 16, "click", 1.0, '{"other": 3}'),
            (900010, T, 17, "click", 1.0, None),
            (900011, T, 18, "click", 1.0, '{"k": 2.5e3}'),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    both = pd.concat([base, extra], ignore_index=True)
    both = both.iloc[
        sorted(range(len(both)), key=lambda i: (i * 2654435761) % 1000003)
    ].reset_index(drop=True)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(both, schema=schema, preserve_index=False),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_twin_holds_on_perturbed_fixture(spark, perturbed_events_dir, name):
    q = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(perturbed_events_dir)
    try:
        ok, detail = strict_compare(q[name](spark, perturbed_events_dir), con, osql[name])
        assert ok, f"{name} diverged on perturbed events: {detail}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# lineitem numeric edges — the describe/validate twin family
# ---------------------------------------------------------------------------

LINEITEM_QUERIES = [
    "describe_lineitem",
    "describe_lineitem_approx",
    "validate_lineitem",
    "equidepth_histogram",
    "correlation_lineitem",
    # merge-equals-whole + sketch bands under NaN/-0.0/subnormal/NULL
    # numeric edges (round 5)
    "incremental_profile",
]


@pytest.fixture(scope="module")
def perturbed_lineitem_dir(tmp_path_factory):
    """sf0.001 with numeric-edge lineitem rows: NaN (must canonicalize
    to NULL identically on both engines), negative zero, a subnormal
    (5e-324), an exact 0.0, and negative prices. Catastrophic
    cancellation pairs (±1e150) are deliberately NOT planted: float
    summation is order-dependent on ANY distributed engine, DuckDB's
    stddev errors outright at overflow range, and CHANGES.md §7
    documents the noise-floor contract that covers the cv statistic —
    a fixture built to flip summation order tests IEEE-754, not this
    engine."""
    import pandas as pd
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("perturbed_lineitem")
    for t in TABLES:
        if t == "lineitem":
            continue
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(f"{SRC}/lineitem.parquet")
    base = tbl.to_pandas()
    ex = base.iloc[:4].copy()
    ex["l_orderkey"] = [99000001, 99000002, 99000003, 99000004]
    ex["l_extendedprice"] = [123456.789, -98765.4321, 5e-324, 0.0]
    ex["l_quantity"] = [float("nan"), -0.0, 123.456, 7.0]
    both = pd.concat([base, ex], ignore_index=True)
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(both, schema=tbl.schema, preserve_index=False),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", LINEITEM_QUERIES)
def test_lineitem_twin_holds_on_numeric_edges(spark, perturbed_lineitem_dir, name):
    q = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(perturbed_lineitem_dir)
    try:
        ok, detail = strict_compare(q[name](spark, perturbed_lineitem_dir), con, osql[name])
        assert ok, f"{name} diverged on numeric-edge lineitem: {detail}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# embeddings edges — the similarity/ANN twin family
# ---------------------------------------------------------------------------

EMBEDDING_QUERIES = [
    "embedding_profile",
    "cosine_topk",
    "embedding_near_dup",
    "cosine_topk_lsh",
    # recall contract: NULL/zero/tiny/ragged corpus vectors must not
    # crash centroid training (round 5: sample_centroids hardening)
    "cosine_topk_ivf",
]


@pytest.fixture(scope="module")
def perturbed_embeddings_dir(tmp_path_factory):
    """sf0.001 with adversarial embeddings: an all-zero vector (cosine
    0/0 — caught a real ANSI divide-by-zero crash when introduced,
    round 4), a NULL embedding (caught a ragged numpy-stack crash), a
    tiny-norm vector, and a wrong-dimension vector (excluded on both
    engines: numpy dim filter / DuckDB out-of-bounds list access →
    NULL cosine)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("perturbed_embeddings")
    for t in TABLES:
        if t == "embeddings":
            continue
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    base = tbl.to_pandas()
    dim = len(base["embedding"].iloc[0])
    extra = pd.DataFrame(
        {
            "vec_id": [8800001, 8800002, 8800003, 8800004, 8800005],
            "embedding": [
                np.zeros(dim, dtype=np.float32),
                None,
                np.full(dim, 1e-30, dtype=np.float32),
                np.arange(dim, dtype=np.float32) - dim / 2,
                np.ones(3, dtype=np.float32),
            ],
            "label": [1, 2, None, 3, 4],
        }
    )
    both = pd.concat([base, extra], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(both, schema=tbl.schema, preserve_index=False),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_embedding_twin_holds_on_edges(spark, perturbed_embeddings_dir, name):
    q = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(perturbed_embeddings_dir)
    try:
        ok, detail = strict_compare(q[name](spark, perturbed_embeddings_dir), con, osql[name])
        assert ok, f"{name} diverged on edge embeddings: {detail}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# orders/customer edges — the describe/psi/unique/geo twin family
# ---------------------------------------------------------------------------

ORDERS_QUERIES = [
    "describe_orders_customer",  # o_orderdate quantiles, acctbal moments
    "psi_drift",                 # o_totalprice binning w/ NULL + extremes
    "profile_drift",             # snapshot stat pairs
    "validate_unique",           # o_custkey dup flagging w/ planted dups
    "dedup_exact_report",        # keep-first under duplicate keys (F1+F11 spine)
    "geo_validate_rules",        # geometry synthesized from o_orderkey
]


@pytest.fixture(scope="module")
def perturbed_orders_dir(tmp_path_factory):
    """sf0.001 with adversarial orders + customer: shuffled order,
    duplicate keys, NULL dates/prices/strings, epoch-boundary and
    far-future dates, negative and huge totalprice, negative acctbal —
    the properties a regenerated fixture may or may not carry."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("perturbed_orders")
    for t in TABLES:
        if t in ("orders", "customer"):
            continue
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")

    base = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    dup_key = int(base["o_orderkey"].iloc[0])
    dup_cust = int(base["o_custkey"].iloc[0])
    extra = pd.DataFrame(
        [
            # duplicate o_orderkey AND o_custkey (keep-first + unique)
            (dup_key, dup_cust, "O", 111.11, dt.datetime(2024, 1, 2), "1-URGENT"),
            # NULL date (describe must drop it from quantile ranks)
            (91000001, 42, "F", 222.22, None, "2-HIGH"),
            # NULL totalprice (psi binning must skip it)
            (91000002, 42, "F", None, dt.datetime(2024, 1, 3), "3-MEDIUM"),
            # epoch-boundary date + far-future microsecond edge
            (91000003, 43, "O", 10.0, dt.datetime(1970, 1, 1), "4-NOT SPECIFIED"),
            (91000004, 43, "O", 20.0,
             dt.datetime(2099, 12, 31, 23, 59, 59, 999999), "5-LOW"),
            # negative and huge totalprice (bin-edge outliers)
            (91000005, 44, "F", -5.0, dt.datetime(2024, 2, 1), "1-URGENT"),
            (91000006, 44, "F", 1.0e12, dt.datetime(2024, 2, 2), "1-URGENT"),
            # NULL strings
            (91000007, 45, None, 33.0, dt.datetime(2024, 2, 3), None),
        ],
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    both = pd.concat([base, extra], ignore_index=True)
    both = both.iloc[
        sorted(range(len(both)), key=lambda i: (i * 2654435761) % 1000003)
    ].reset_index(drop=True)
    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(both, schema=schema, preserve_index=False),
        str(d / "orders.parquet"),
    )

    cbase = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    cdup = int(cbase["c_custkey"].iloc[0])
    cextra = pd.DataFrame(
        [
            (cdup, "Duplicate Key Co", 1, 50.0, "BUILDING"),
            (95000001, None, 2, None, None),          # NULL name/bal/segment
            (95000002, "Négatïve Bàlance 中文", 3, -999.99, "MACHINERY"),
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    cboth = pd.concat([cbase, cextra], ignore_index=True)
    cboth = cboth.iloc[
        sorted(range(len(cboth)), key=lambda i: (i * 2654435761) % 1000003)
    ].reset_index(drop=True)
    cschema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(cboth, schema=cschema, preserve_index=False),
        str(d / "customer.parquet"),
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORDERS_QUERIES)
def test_orders_twin_holds_on_perturbed_fixture(spark, perturbed_orders_dir, name):
    q = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(perturbed_orders_dir)
    try:
        ok, detail = strict_compare(q[name](spark, perturbed_orders_dir), con, osql[name])
        assert ok, f"{name} diverged on perturbed orders/customer: {detail}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# part-table edges — the fuzzy-matching / pattern / frequent-values family
# ---------------------------------------------------------------------------

PART_QUERIES = [
    "fuzzy_pairs_part",   # Levenshtein prefix-block join over p_brand
    "validate_pattern",   # regex rule over part strings
    "frequent_histogram", # top-n p_brand frequent values
]


@pytest.fixture(scope="module")
def perturbed_part_dir(tmp_path_factory):
    """sf0.001 with an adversarial part table: shuffled order, NULL
    brand/name/type, empty-string and single-char brands (prefix-block
    edges), a unicode brand, a tie-inducing duplicated brand count, and
    duplicate part keys."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("perturbed_part")
    for t in TABLES:
        if t == "part":
            continue
        shutil.copy(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    base = pq.read_table(f"{SRC}/part.parquet").to_pandas()
    dup_key = int(base["p_partkey"].iloc[0])
    extra = pd.DataFrame(
        [
            (dup_key, "dup key row", "Brand#11", "STANDARD", 1, 1.0),
            (97000001, None, None, None, None, None),
            (97000002, "empty brand", "", "SMALL", 2, 2.0),
            (97000003, "one char", "B", "SMALL", 3, 3.0),
            (97000004, "unicode", "Brändé#中文", "LARGE", 4, 4.0),
            # near-miss brand one edit away from a real one (fuzzy edge)
            (97000005, "near miss", "Brand#1", "MEDIUM", 5, 5.0),
        ],
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
    )
    both = pd.concat([base, extra], ignore_index=True)
    both = both.iloc[
        sorted(range(len(both)), key=lambda i: (i * 2654435761) % 1000003)
    ].reset_index(drop=True)
    schema = pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("p_name", pa.string()),
            ("p_brand", pa.string()),
            ("p_type", pa.string()),
            ("p_size", pa.int32()),
            ("p_retailprice", pa.float64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(both, schema=schema, preserve_index=False),
        str(d / "part.parquet"),
    )
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", PART_QUERIES)
def test_part_twin_holds_on_perturbed_fixture(spark, perturbed_part_dir, name):
    q = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(perturbed_part_dir)
    try:
        ok, detail = strict_compare(q[name](spark, perturbed_part_dir), con, osql[name])
        assert ok, f"{name} diverged on perturbed part: {detail}"
    finally:
        con.close()
