"""WARC/WET ingestion (sources/warc.py, round 12): pure-parser round
trips, the Common Crawl member-per-record gzip layout, the
stop-at-last-whole-record corruption contract, and the Spark reader
surface. The registry `wet_rt` family on corpus_clean hash-pins the
end-to-end round trip against the oracle."""

from __future__ import annotations

import os
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.sources.warc import (
    gunzip_members,
    http_split,
    parse_warc_records,
    read_warc,
    read_wet,
    synth_warc,
)

RECS = [
    {
        "warc_type": "warcinfo",
        "record_id": "<urn:uuid:0>",
        "warc_date": "2026-08-16T00:00:00Z",
        "content_type": "application/warc-fields",
        "payload": b"software: test\r\n",
    },
    {
        "warc_type": "conversion",
        "record_id": "<urn:uuid:1>",
        "target_uri": "http://example.com/a",
        "warc_date": "2026-08-16T00:00:01Z",
        "content_type": "text/plain",
        "payload": "the quick brown fox\njumpsé".encode(),
    },
    {
        "warc_type": "response",
        "record_id": "<urn:uuid:2>",
        "target_uri": "http://example.com/b",
        "warc_date": "2026-08-16T00:00:02Z",
        "content_type": "application/http; msgtype=response",
        "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>",
    },
]


def test_parse_round_trip_plain_and_gzip():
    for gz in (False, True):
        blob = synth_warc(RECS, gzip_per_record=gz)
        recs = parse_warc_records(gunzip_members(blob))
        assert [r["warc-type"] for r in recs] == [
            "warcinfo", "conversion", "response",
        ]
        assert recs[1]["payload"].decode() == "the quick brown fox\njumpsé"
        assert recs[1]["warc-target-uri"] == "http://example.com/a"
        assert recs[2]["content_length"] == len(RECS[2]["payload"])


def test_multi_member_gzip_is_member_per_record():
    blob = synth_warc(RECS, gzip_per_record=True)
    # three independent gzip members, each inflatable alone
    n_members = blob.count(b"\x1f\x8b\x08")
    assert n_members == 3
    assert len(parse_warc_records(gunzip_members(blob))) == 3


def test_truncated_tail_stops_at_last_whole_record():
    blob = synth_warc(RECS, gzip_per_record=False)
    cut = blob[: len(blob) - len(RECS[2]["payload"]) // 2 - 4]
    recs = parse_warc_records(cut)
    assert [r["warc-type"] for r in recs] == ["warcinfo", "conversion"]
    # corrupt gzip member: earlier members still parse
    gz = synth_warc(RECS, gzip_per_record=True)
    second = gz.index(b"\x1f\x8b\x08", 1)
    third = gz.index(b"\x1f\x8b\x08", second + 1)
    mangled = gz[:third] + b"\x1f\x8b\x08" + b"\x00" * 8 + gz[third + 11:]
    recs2 = parse_warc_records(gunzip_members(mangled))
    assert [r["warc-type"] for r in recs2] == ["warcinfo", "conversion"]


def test_bad_header_never_raises():
    assert parse_warc_records(b"WARC/1.0\r\nContent-Length: x\r\n\r\n") == []
    assert parse_warc_records(b"not a warc at all") == []
    assert parse_warc_records(b"") == []
    assert gunzip_members(b"\x1f\x8b\x08garbage") == b""


def test_http_split():
    status, body = http_split(RECS[2]["payload"])
    assert status == "HTTP/1.1 200 OK"
    assert body == b"<html>hi</html>"
    assert http_split(b"no http") == (None, None)
    assert http_split(None) == (None, None)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "a.warc.gz").write_bytes(synth_warc(RECS, gzip_per_record=True))
    more = [
        {
            "warc_type": "conversion",
            "record_id": "<urn:uuid:9>",
            "target_uri": "http://example.com/c",
            "warc_date": "2026-08-16T01:00:00Z",
            "content_type": "text/plain",
            "payload": b"second file text",
        }
    ]
    (d / "b.warc").write_bytes(synth_warc(more, gzip_per_record=False))
    return str(d)


def test_read_warc_spark(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    rows = df.collect()
    assert len(rows) == 4
    assert {r["warc_type"] for r in rows} == {
        "warcinfo", "conversion", "response",
    }
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert bytes(resp[0]["payload"]).startswith(b"HTTP/1.1 200")
    only = read_warc(spark, warc_dir, record_types=("response",)).collect()
    assert len(only) == 1


def test_read_wet_spark(spark, warc_dir):
    df = read_wet(spark, warc_dir)
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows["<urn:uuid:1>"]["text"] == "the quick brown fox\njumpsé"
    assert rows["<urn:uuid:9>"]["text"] == "second file text"
    assert rows["<urn:uuid:9>"]["target_uri"] == "http://example.com/c"


# ---------------------------------------------------------------------------
# F54: html_to_text + the full WARC response → text composition
# ---------------------------------------------------------------------------

HTML = (
    "<html><head><title>T</title><script>var x='</style>';</script>"
    "<style>p{color:red}</style></head><body><h1>Head&nbsp;line</h1>"
    "<p>Hello &amp; world</p><ul><li>A</li><li>B</li></ul>"
    "<!-- hidden --><div>tail &#39;q&#39;</div></body></html>"
)


def test_html_to_text_cross_engine_parity(spark):
    """The Spark expression chain and the DuckDB builder agree
    byte-for-byte on adversarial inputs (the hash contract the
    html_rt family rides on)."""
    import duckdb

    from pyspark.sql import functions as F

    from petk_spark.operators.text import duckdb_html_to_text, html_to_text

    cases = [
        HTML,
        "plain, no tags",
        "<p>a</p>\n\n\n\n\n<p>b</p>",
        "<div class='x'>&lt;tag&gt; &quot;q&quot;</div>",
        "<TABLE><TR><TD>a</TD></TR><TR><TD>b</TD></TR></TABLE>",
        "<br><br /><BR>lines",
        "",
        # round 13: numeric references (dec/hex/zero-pad/case) and
        # escaped entity references (the &amp;-last ordering fix)
        "d&#8217;arc &#x2019; &#X2019; &#08217; quote&#039;s",
        "&amp;lt;not-a-tag&amp;gt; &amp;amp; &#38;quot; &#x26;nbsp;",
        "dash &#8211;&#x2013; em &#8212; euro &#8364;&#x20ac;"
        " &#169;&#xA9; bullet&#8226; &#8230; &#160;nbsp",
        # round 14 (r13 verdict #5): named cp1252-set spellings,
        # lenient case, and one-level decode of escaped names
        "&mdash; &ndash; &rsquo;s &lsquo;q&rsquo; &ldquo;w&rdquo;"
        " &hellip; &bull; &copy; &reg; &euro; &apos;",
        "&MDASH; &Hellip; 5&deg; a&middot;b &laquo;x&raquo; t&trade;",
        "&amp;mdash; &amp;hellip; not&mdashx; &mdash",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    con = duckdb.connect()
    sql = f"SELECT {duckdb_html_to_text('?')}"
    for i, c in enumerate(cases):
        assert got[i] == con.execute(sql, [c]).fetchone()[0], (i, got[i])


def test_html_to_text_content(spark):
    from pyspark.sql import functions as F

    from petk_spark.operators.text import html_to_text

    df = spark.createDataFrame([(0, HTML)], "i long, h string")
    t = df.select(html_to_text(F.col("h")).alias("t")).collect()[0]["t"]
    assert "Hello & world" in t
    assert "Head line" in t          # &nbsp; decoded
    assert "'q'" in t                # &#39; decoded
    assert "color:red" not in t      # style dropped
    assert "hidden" not in t         # comment dropped
    assert "var x" not in t          # script dropped
    assert "<" not in t.replace("<tag>", "")  # no tags survive


def test_html_entities_numeric_and_escaped(spark):
    """Round 13 (r12 verdict #7 + advisory): numeric character
    references decode to their code points, and ESCAPED entity
    references decode exactly one level — '&amp;lt;' is the literal
    text '&lt;', not '<' (the old &amp;-first ordering double-decoded
    it)."""
    from pyspark.sql import functions as F

    from petk_spark.operators.text import html_to_text

    cases = {
        0: "<p>d&#8217;arc &#x2019; &#039;</p>",
        1: "<p>&amp;lt;esc&amp;gt; &amp;amp; Tom &amp; Jerry</p>",
        2: "<p>&#8211; &#8212; &#8364; &#169; &#8230;</p>",
        3: "<p>a&#160;b &#34;q&#x22;</p>",
    }
    df = spark.createDataFrame(list(cases.items()), "i long, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    assert "d’arc ’ '" in got[0]
    # one-level decode: the literal entity text survives
    assert "&lt;esc&gt;" in got[1]
    assert "&amp;" in got[1]
    assert "Tom & Jerry" in got[1]
    assert "– — € © …" in got[2]
    assert 'a b "q"' in got[3]       # &#160; → plain space


def test_html_entities_named(spark):
    """Round 14 (r13 verdict #5): the cp1252 punctuation set decodes
    from its NAMED spellings (the form real pages actually write) with
    the same one-level escaped-reference semantics."""
    from pyspark.sql import functions as F

    from petk_spark.operators.text import html_to_text

    cases = {
        0: "<p>x&mdash;y &ndash; d&rsquo;arc &lsquo;q&rsquo;</p>",
        1: "<p>&ldquo;w&rdquo; wait&hellip; &bull; item</p>",
        2: "<p>&copy;2024 &reg; 9&euro; it&apos;s t&trade;</p>",
        3: "<p>5&deg;C a&middot;b &laquo;fr&raquo;</p>",
        4: "<p>&amp;mdash; stays; un&mdashx; unknown&zzz;</p>",
    }
    df = spark.createDataFrame(list(cases.items()), "i long, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    assert "x—y – d’arc ‘q’" in got[0]
    assert "“w” wait… • item" in got[1]
    assert "©2024 ® 9€ it's t™" in got[2]
    assert "5°C a·b «fr»" in got[3]
    # escaped name decodes one level; malformed/unknown pass through
    assert "&mdash; stays" in got[4]
    assert "un&mdashx;" in got[4]
    assert "unknown&zzz;" in got[4]


def test_warc_text_corpus_composition(spark, tmp_path):
    from petk_spark.sources.warc import synth_warc, warc_text_corpus

    recs = [
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:42>",
            "target_uri": "http://example.com/page",
            "warc_date": "2026-08-16T02:00:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + HTML.encode()
            ),
        },
        {   # non-HTTP payload → NULL text, row preserved
            "warc_type": "response",
            "record_id": "<urn:uuid:43>",
            "target_uri": "http://example.com/raw",
            "payload": b"raw bytes, no envelope",
        },
        {   # conversion record must be filtered out
            "warc_type": "conversion",
            "record_id": "<urn:uuid:44>",
            "payload": b"wet text",
        },
    ]
    d = tmp_path / "w"
    d.mkdir()
    (d / "f.warc.gz").write_bytes(synth_warc(recs))
    rows = {
        r["record_id"]: r
        for r in warc_text_corpus(spark, str(d)).collect()
    }
    assert set(rows) == {"<urn:uuid:42>", "<urn:uuid:43>"}
    page = rows["<urn:uuid:42>"]
    assert page["status"] == "HTTP/1.1 200 OK"
    assert "Hello & world" in page["text"]
    assert "var x" not in page["text"]
    assert rows["<urn:uuid:43>"]["status"] is None
    assert rows["<urn:uuid:43>"]["text"] is None


# ---------------------------------------------------------------------------
# charset-aware decode + chunked transfer coding (round 16, r15 #4)
# ---------------------------------------------------------------------------


def test_dechunk_and_header_split():
    from petk_spark.sources.warc import _dechunk, http_split_headers

    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    assert _dechunk(body) == b"Wikipedia"
    # malformed frame stops at bytes assembled so far
    assert _dechunk(b"4\r\nWiki\r\nZZ\r\nx") == b"Wiki"
    assert _dechunk(b"nonsense") == b""
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html;"
        b" charset=Windows-1252\r\nTransfer-Encoding: chunked\r\n\r\n"
        + body
    )
    s, h, b = http_split_headers(payload)
    assert s == "HTTP/1.1 200 OK"
    assert h["content-type"] == "text/html; charset=Windows-1252"
    assert b == b"Wikipedia"
    assert http_split_headers(None) == (None, None, None)
    assert http_split_headers(b"junk") == (None, None, None)


def test_decode_http_body_charsets():
    from petk_spark.sources.warc import decode_http_body

    cp = "café €™".encode("cp1252")
    assert decode_http_body(
        cp, "text/html; charset=windows-1252"
    ) == "café €™"
    assert decode_http_body(
        "café".encode("latin-1"), "text/plain; charset=ISO-8859-1"
    ) == "café"
    # header wins; meta is the fallback
    meta = (
        b'<html><meta charset="windows-1252"><body>'
        + "déjà €".encode("cp1252")
    )
    assert decode_http_body(meta, "text/html").endswith("déjà €")
    meta2 = (
        b'<meta http-equiv="Content-Type" content="text/html;'
        b' charset=iso-8859-1">' + "café".encode("latin-1")
    )
    assert decode_http_body(meta2, None).endswith("café")
    # unknown charset: declared UTF-8/replace passthrough
    assert decode_http_body(b"ok", "text/html; charset=gb2312") == "ok"
    assert decode_http_body(None, "text/html") is None


def test_read_wet_honors_declared_charset(spark, tmp_path):
    from petk_spark.sources.warc import read_wet, synth_warc

    recs = [
        {
            "warc_type": "conversion",
            "record_id": "<urn:uuid:1>",
            "target_uri": "http://cc.test/1",
            "content_type": "text/plain; charset=Windows-1252",
            "payload": "smart “quote” €".encode("cp1252"),
        },
        {
            "warc_type": "conversion",
            "record_id": "<urn:uuid:2>",
            "target_uri": "http://cc.test/2",
            "content_type": "text/plain; charset=ISO-8859-1",
            "payload": "naïve ±".encode("latin-1"),
        },
        {
            "warc_type": "conversion",
            "record_id": "<urn:uuid:3>",
            "target_uri": "http://cc.test/3",
            "content_type": "text/plain",
            "payload": "utf-8 né €".encode("utf-8"),
        },
    ]
    d = tmp_path / "wet"
    d.mkdir()
    (d / "f.warc.gz").write_bytes(synth_warc(recs))
    rows = {r["record_id"]: r["text"]
            for r in read_wet(spark, str(d)).collect()}
    assert rows["<urn:uuid:1>"] == "smart “quote” €"
    assert rows["<urn:uuid:2>"] == "naïve ±"
    assert rows["<urn:uuid:3>"] == "utf-8 né €"


def test_warc_text_corpus_charset_and_chunked(spark, tmp_path):
    from petk_spark.sources.warc import synth_warc, warc_text_corpus

    html = "<html><body><p>déjà vu — €5</p></body></html>".encode(
        "cp1252"
    )
    chunked = (
        hex(len(html))[2:].encode() + b"\r\n" + html + b"\r\n0\r\n\r\n"
    )
    recs = [
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:9>",
            "payload": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html;"
                b" charset=windows-1252\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + chunked
            ),
        },
    ]
    d = tmp_path / "wc"
    d.mkdir()
    (d / "f.warc.gz").write_bytes(synth_warc(recs))
    row = warc_text_corpus(spark, str(d)).collect()[0]
    assert row["text"].strip() == "déjà vu — €5"


def test_content_encoding_gzip_and_deflate():
    import zlib

    from petk_spark.sources.warc import http_split_headers

    html = "gzip body déjà".encode("utf-8")
    gz = zlib.compress(html, 6, wbits=31)
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz
    )
    _s, _h, b = http_split_headers(payload)
    assert b == html
    # zlib-wrapped deflate
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
        + zlib.compress(html)
    )
    assert http_split_headers(payload)[2] == html
    # raw deflate (the historical IIS shape)
    raw = zlib.compressobj(wbits=-15)
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
        + raw.compress(html) + raw.flush()
    )
    assert http_split_headers(payload)[2] == html
    # corrupt → raw bytes kept, never a raise
    payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnotgz"
    assert http_split_headers(payload)[2] == b"notgz"
    # chunked + gzip compose (chunk framing first, then inflate)
    chunks = (
        hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + chunks
    )
    assert http_split_headers(payload)[2] == html
