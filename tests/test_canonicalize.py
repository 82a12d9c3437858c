"""Unicode text canonicalization (operators/text.py, round 13 — F59):
NFC composition + zero-width strip for dedup prep. The corpus_clean
``nfc_rt`` family hash-pins the cross-engine replay; these tests pin
the kernel semantics and the DuckDB parity on combining-sequence
adversaries."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petk_spark.operators.text import (
    canonicalize_text_frame,
    duckdb_canonicalize_text,
)

CASES = [
    "cafe\u0301",             # decomposed acute -> caf\u00e9
    "caf\u00e9",              # precomposed stays
    "A\u030arhus",            # decomposed ring -> \u00c5rhus
    "a\u200bb\u200cc\u200dd",   # zero-width space/nonjoiner/joiner
    "x\u00ady\u2060z\ufeffw",   # soft hyphen, word joiner, BOM
    "q\u0327\u0301",         # multiple combining marks reorder
    "\ud55c\uad6d\uc5b4 plain ascii 123",
    "",
]


def _canon(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    return {
        r["i"]: r["ct"]
        for r in canonicalize_text_frame(df, "t", out_col="ct", **kw)
        .collect()
    }


def test_nfc_composes_and_strips(spark):
    got = _canon(spark, CASES)
    assert got[0] == "caf\u00e9"
    assert got[1] == "caf\u00e9"
    assert got[0] == got[1]                       # the dedup win
    assert got[2] == "\u00c5rhus"
    assert got[3] == "abcd"
    assert got[4] == "xyzw"
    assert got[7] == ""


def test_duckdb_parity(spark):
    import duckdb

    got = _canon(spark, CASES)
    con = duckdb.connect()
    sql = f"SELECT {duckdb_canonicalize_text('?')}"
    for i, t in enumerate(CASES):
        assert got[i] == con.execute(sql, [t]).fetchone()[0], (i, t)


def test_null_and_in_place_and_forms(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "caf\u00e9")], "i long, t string"
    )
    # in-place overwrite keeps schema, None passes through
    out = {r["i"]: r["t"]
           for r in canonicalize_text_frame(df, "t").collect()}
    assert out[0] is None and out[1] == "caf\u00e9"
    # NFD decomposes (engine-side mode, oracle-excluded by doc)
    nfd = _canon(spark, ["caf\u00e9"], form="NFD")
    assert nfd[0] == "cafe\u0301"
    with pytest.raises(ValueError):
        canonicalize_text_frame(df, "t", form="nfc-ish")


def test_strip_disabled(spark):
    got = _canon(spark, ["a\u200bb"], strip_zero_width=False)
    assert got[0] == "a\u200bb"


def test_fingerprint_integration(spark):
    """The operator's purpose: composed and decomposed spellings of
    the same text fingerprint identically after canonicalization."""
    from petk_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(0, "résumé text"), (1, "résumé text"),
         (2, "résumé​ text")],
        "i long, t string",
    )
    raw = df.select(fingerprint(F.col("t")).alias("fp")).distinct().count()
    canon = canonicalize_text_frame(df, "t")
    after = canon.select(
        fingerprint(F.col("t")).alias("fp")
    ).distinct().count()
    assert raw == 3 and after == 1
