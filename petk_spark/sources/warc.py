"""WARC / WET ingestion (SURVEY §2.A1 widening, round 12) — the
Common Crawl wire formats an LLM training-data pipeline actually
ingests. Beyond-reference (petk reads local tabular files only); the
format is public ISO 28500 / the Common Crawl WET convention.

Scale design: the unit of parallelism is the FILE — Common Crawl
publishes ~10⁵ WET/WARC files per crawl at ~150 MB gzip each, so a
``binaryFile`` scan gives one task per file with no splitting logic
(and Common Crawl's per-record gzip members make anything finer
unnecessary: a whole member must be inflated to be read anyway). The
parse is a map-only Arrow kernel — zero shuffles; downstream operators
(dedup, quality, language ID) see an ordinary ``documents``-shaped
frame. Per-task memory is bounded by one inflated file (~400 MB for a
crawl WET), which is the format's own design point; pathological
single files are the caller's `maxBytesPerTrigger`-style concern, not
a shuffle problem.

Corrupt data contract (repo-wide, like the media decoders): a
malformed region STOPS the parse of that file at the last whole
record — records already parsed are emitted, the task never fails.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: WARC named fields surfaced as columns (lowercased header names).
_FIELDS = (
    "warc-record-id",
    "warc-type",
    "warc-target-uri",
    "warc-date",
    "content-type",
)

WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary"
)


def gunzip_members(data: bytes) -> bytes:
    """Inflate a (possibly multi-member) gzip stream — Common Crawl
    writes ONE gzip member PER RECORD, concatenated. Plain data passes
    through; a corrupt member truncates to the bytes inflated so far
    (the stop-at-last-whole-record contract)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break
        if not d.eof:
            break
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse concatenated WARC records from an inflated byte string.
    Returns dicts with the _FIELDS values, ``content_length`` and
    ``payload``. Header names are case-insensitive (ISO 28500 §4);
    a malformed header block / truncated payload ends the parse."""
    records: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            break
        body = hdr_end + 4
        if clen < 0 or body + clen > n:
            break
        rec = {f: fields.get(f) for f in _FIELDS}
        rec["content_length"] = clen
        rec["payload"] = data[body : body + clen]
        records.append(rec)
        pos = body + clen
    return records


def synth_warc(records: list[dict], gzip_per_record: bool = True) -> bytes:
    """Serialize WARC records for fixtures/tests. Each dict may carry
    ``warc_type``, ``record_id``, ``target_uri``, ``warc_date``,
    ``content_type`` and ``payload`` (bytes). ``gzip_per_record``
    writes the Common Crawl member-per-record layout."""
    out = []
    for r in records:
        payload = r.get("payload", b"")
        head = [b"WARC/1.0"]
        for key, name in (
            ("warc_type", b"WARC-Type"),
            ("record_id", b"WARC-Record-ID"),
            ("warc_date", b"WARC-Date"),
            ("target_uri", b"WARC-Target-URI"),
            ("content_type", b"Content-Type"),
        ):
            v = r.get(key)
            if v is not None:
                head.append(name + b": " + str(v).encode())
        head.append(b"Content-Length: " + str(len(payload)).encode())
        blob = b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        out.append(zlib.compress(blob, 6, wbits=31) if gzip_per_record
                   else blob)
    return b"".join(out)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Scan WARC/WET files into ``WARC_SCHEMA`` rows. ``record_types``
    filters on WARC-Type INSIDE the kernel (e.g. ``("response",)`` /
    ``("conversion",)``) so unwanted payload bytes never enter the
    Arrow batch."""
    bf = spark.read.format("binaryFile").load(path).select("path", "content")
    want = tuple(record_types) if record_types else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "file", "record_id", "warc_type", "target_uri",
            "warc_date", "content_type", "content_length", "payload",
        ]
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = gunzip_members(bytes(content))
                for rec in parse_warc_records(data):
                    if want and rec["warc-type"] not in want:
                        continue
                    rows["file"].append(fpath)
                    rows["record_id"].append(rec["warc-record-id"])
                    rows["warc_type"].append(rec["warc-type"])
                    rows["target_uri"].append(rec["warc-target-uri"])
                    rows["warc_date"].append(rec["warc-date"])
                    rows["content_type"].append(rec["content-type"])
                    rows["content_length"].append(rec["content_length"])
                    rows["payload"].append(rec["payload"])
            out = pd.DataFrame(rows, columns=cols)
            out["content_length"] = out["content_length"].astype("int64")
            yield out

    return bf.mapInPandas(run, WARC_SCHEMA)


#: cp1252's 0x80–0x9F block (the only bytes where it diverges from
#: ISO-8859-1); 0x81/0x8D/0x8F/0x90/0x9D are undefined and pass
#: through as their C1 code points.
_CP1252_DEFINED = tuple(
    c for c in range(0x80, 0xA0) if c not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
)
_C1_CHARS = "".join(chr(c) for c in _CP1252_DEFINED)
_CP1252_CHARS = bytes(_CP1252_DEFINED).decode("cp1252")

#: charset tokens the engine-replayable decode path honors; anything
#: else (gb2312, shift-jis, …) is declared passthrough → UTF-8/replace
#: until a full codec table is worth its weight.
_LATIN1_NAMES = ("iso-8859-1", "latin-1", "latin1", "iso8859-1")
_CP1252_NAMES = ("windows-1252", "cp1252", "cp-1252", "win-1252")


def _charset_expr(content_type_col):
    """The declared charset token of a Content-Type column, lowered;
    empty string when absent."""
    return F.lower(
        F.regexp_extract(
            F.coalesce(content_type_col, F.lit("")),
            r"(?i)charset=['\"]?\s*([A-Za-z0-9_\-]+)",
            1,
        )
    )


def decode_payload_expr(payload_col, content_type_col):
    """JVM-side charset-aware text decode (round 16, r15 verdict #4):
    honor the Content-Type ``charset=`` parameter for the codecs both
    engines can replay — UTF-8 (default), ISO-8859-1, and cp1252
    (ISO-8859-1 decode + a 27-char ``translate`` of the 0x80–0x9F
    block, so the whole path stays inside whole-stage codegen — Spark's
    built-in ``decode`` does not ship windows-1252). Unknown charsets
    fall through to UTF-8-with-replacement, the declared passthrough."""
    cs = _charset_expr(content_type_col)
    latin = F.decode(payload_col, "ISO-8859-1")
    return (
        F.when(cs.isin(*_CP1252_NAMES),
               F.translate(latin, _C1_CHARS, _CP1252_CHARS))
        .when(cs.isin(*_LATIN1_NAMES), latin)
        .otherwise(F.decode(payload_col, "UTF-8"))
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET convenience view: ``conversion`` records with the payload
    decoded to text — the ``documents``-shaped frame the text
    operators consume directly. Common Crawl WET is UTF-8 by
    convention, but records that DECLARE a charset in their
    Content-Type (the r15-flagged mojibake source: cp1252/latin-1
    bodies decoded as UTF-8 poison dedup fingerprints and LM scores)
    are honored via :func:`decode_payload_expr`."""
    return read_warc(spark, path, record_types=("conversion",)).select(
        "file",
        "record_id",
        "target_uri",
        "warc_date",
        "content_length",
        decode_payload_expr(F.col("payload"), F.col("content_type"))
        .alias("text"),
    )


def http_split_headers(
    payload: bytes | None,
) -> tuple[str | None, dict[str, str] | None, bytes | None]:
    """Split a WARC ``response`` payload into (status_line, headers,
    body) — the HTTP envelope is part of the record in response WARCs.
    Header names are lowercased; a chunked Transfer-Encoding body is
    de-chunked (round 16 — previously passed through unsplit, which
    left chunk-size lines inside the text). Returns (None, None, None)
    when the payload carries no HTTP header block."""
    if payload is None or not payload.startswith(b"HTTP/"):
        return None, None, None
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, None
    head = payload[:sep].decode("utf-8", "replace").split("\r\n")
    headers: dict[str, str] = {}
    for line in head[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = payload[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if "gzip" in enc or "deflate" in enc:
        body = _decompress_body(body)
    return head[0], headers, body


def _decompress_body(body: bytes) -> bytes:
    """Undo a gzip/deflate Content-Encoding (crawl WARCs store the
    wire bytes verbatim). gzip via the member-per-record inflater;
    zlib-wrapped then raw deflate otherwise. A body that does not
    decompress is returned AS-IS — degrading to the raw bytes beats
    dropping the document (the corrupt-input contract)."""
    if body[:2] == b"\x1f\x8b":
        out = gunzip_members(body)
        return out if out else body
    for wbits in (15, -15):
        try:
            return zlib.decompress(body, wbits)
        except zlib.error:
            continue
    return body


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer coding: ``<hex-size>[;ext]\\r\\n
    <data>\\r\\n`` … ``0\\r\\n\\r\\n``. A malformed chunk frame stops at the
    bytes assembled so far (the stop-at-last-whole contract)."""
    out = []
    pos, n = 0, len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        start = eol + 2
        if start + size > n:
            break
        out.append(body[start:start + size])
        pos = start + size + 2                     # skip trailing CRLF
    return b"".join(out)


def http_split(payload: bytes | None) -> tuple[str | None, bytes | None]:
    """Back-compat (status_line, body) view of
    :func:`http_split_headers`."""
    status, _headers, body = http_split_headers(payload)
    return status, body


_CHARSET_RE = re.compile(r"(?i)charset=['\"]?\s*([A-Za-z0-9_\-]+)")
_META_CHARSET_RE = re.compile(
    rb"(?i)<meta[^>]{0,200}?charset=['\"]?\s*([A-Za-z0-9_\-]+)"
)


def decode_http_body(
    body: bytes | None, content_type: str | None
) -> str | None:
    """Charset-aware HTTP body decode (round 16, r15 verdict #4):
    honor the Content-Type header's ``charset=`` parameter, fall back
    to an html ``<meta charset=…>`` /
    ``<meta http-equiv … content="…charset=…">`` scan of the first
    2 KiB, default UTF-8-with-replacement. Engine-replayable codec
    set: utf-8, ISO-8859-1/latin-1, cp1252/windows-1252 — everything
    else is declared passthrough (UTF-8/replace), the same seam the
    JVM path (:func:`decode_payload_expr`) declares."""
    if body is None:
        return None
    token = None
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            token = m.group(1).lower()
    if token is None:
        m = _META_CHARSET_RE.search(body[:2048])
        if m:
            token = m.group(1).decode("ascii", "replace").lower()
    if token in _CP1252_NAMES:
        return body.decode("cp1252", "replace")
    if token in _LATIN1_NAMES:
        return body.decode("latin-1", "replace")
    return body.decode("utf-8", "replace")


def warc_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """The full Common Crawl ingestion composition: ``response``
    records → HTTP envelope split (Arrow kernel) → JVM-side
    :func:`~petk_spark.operators.text.html_to_text` →
    ``(record_id, target_uri, warc_date, status, text)`` — a
    documents-shaped frame ready for the dedup/quality/language
    operators. Map-only end-to-end (per-file parallelism, zero
    shuffles); the tag-strip chain itself is hash-pinned by the
    ``html_rt`` family on corpus_clean, the container walk by
    ``wet_rt``. Round 16: the body decode honors the HTTP
    Content-Type charset (meta-tag fallback) via
    :func:`decode_http_body`, and chunked transfer coding is undone,
    instead of the old unconditional UTF-8/replace."""
    from petk_spark.operators.text import html_to_text

    resp = read_warc(spark, path, record_types=("response",))

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stat, body = [], []
            for p in pdf["payload"]:
                s, hdrs, b = http_split_headers(
                    None if p is None else bytes(p)
                )
                stat.append(s)
                body.append(decode_http_body(
                    b, (hdrs or {}).get("content-type")
                ))
            out = pdf[["record_id", "target_uri", "warc_date"]].copy()
            out["status"] = stat
            out["html"] = body
            yield out

    frame = resp.mapInPandas(
        split,
        "record_id string, target_uri string, warc_date string, "
        "status string, html string",
    )
    return frame.select(
        "record_id",
        "target_uri",
        "warc_date",
        "status",
        html_to_text(F.col("html")).alias("text"),
    )
