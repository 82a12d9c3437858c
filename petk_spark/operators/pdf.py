"""PDF ingestion (round 15, F64 — r14 verdict #2): the largest
text-bearing crawl format.

Two tiers, same discipline as the other container modules:

* **metadata** — header version + xref/trailer walk → object count,
  page count (``/Type /Pages /Count``), all closed-form integers
  (F57/F58 discipline); a ``pdf`` kind on ``media_metadata``.
* **text extraction** — per page, the ``/Contents`` stream (raw or
  ``/FlateDecode`` — zlib is already a proven in-repo dependency via
  the PNG path) is walked for ``Tj`` / ``TJ`` / ``'`` text-showing
  operators with full PDF literal-string unescaping (octal, named
  escapes, nested parens, line continuations); pages join with
  newlines. Feeds the ``documents`` shape directly — the WARC→HTML→
  text precedent (F54) for pipeline composition; the ``pdf_rt``
  family on ``corpus_clean`` replays the extracted text's md5 from
  the synthesis arithmetic.

Out of scope by the metadata-not-full-render policy: fonts, layout,
encoding CMaps (text is assumed PDFDocEncoded/ASCII — the synthesized
fixture tier and the bulk of crawl text), encryption, object streams
(xref streams, PDF 1.5+) — each a documented swap seam for a real
renderer. ``parse_pdf_metadata`` returns None for those rather than
guessing.

Reference parity: the reference engine is tabular-only — declared
beyond-reference. Scale: row-local Arrow kernels over ``mapInPandas``,
zero shuffles, corrupt → valid=false, never task failure.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_pdf",
    "parse_pdf_metadata",
    "extract_pdf_text",
    "pdf_text_frame",
    "read_pdf",
    "PDF_TEXT_SCHEMA",
]


# ---------------------------------------------------------------------------
# synthesis (fixture tier): a genuine incremental writer — header,
# numbered objects, a correct byte-offset xref table, trailer.
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def synth_pdf(
    page_texts: Sequence[str],
    version: str = "1.4",
    flate: bool = True,
    tj_array_first_page: bool = False,
) -> bytes:
    """Minimal valid PDF: catalog → pages → one page + one content
    stream per entry of ``page_texts`` + a shared Type1 font object,
    real xref offsets, trailer, startxref. ``flate`` zlib-compresses
    the content streams (``/Filter /FlateDecode``);
    ``tj_array_first_page`` shows the first page's text as a split
    ``TJ`` array (with kerning numbers) instead of one ``Tj`` so both
    operators are exercised by fixtures."""
    n_pages = len(page_texts)
    font_num = 3 + 2 * n_pages
    objs: list[bytes] = []                        # 1-based object bodies
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(page_texts):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * i} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        if i == 0 and tj_array_first_page and len(text) >= 2:
            mid = len(text) // 2
            shown = (
                f"[({_pdf_escape(text[:mid])}) -250 "
                f"({_pdf_escape(text[mid:])})] TJ"
            )
        else:
            shown = f"({_pdf_escape(text)}) Tj"
        content = (
            f"BT /F1 12 Tf 72 720 Td {shown} ET".encode("latin-1")
        )
        if flate:
            data = zlib.compress(content)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            data = content
            head = f"<< /Length {len(data)} >>"
        objs.append(
            head.encode() + b"\nstream\n" + data + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(f"%PDF-{version}\n".encode())
    out += b"%\xe2\xe3\xcf\xd3\n"                 # binary-marker comment
    offsets = [0]                                 # object 0 is the free head
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def _dict_ref(obj: bytes, key: str) -> Optional[int]:
    m = re.search(rf"/{key}\s+(\d+)\s+\d+\s+R".encode(), obj)
    return int(m.group(1)) if m else None


def _dict_int(obj: bytes, key: str) -> Optional[int]:
    m = re.search(rf"/{key}\s+(\d+)".encode(), obj)
    return int(m.group(1)) if m else None


def _load_xref(p: bytes) -> Optional[tuple[dict[int, int], bytes]]:
    """startxref → classic xref table → ({obj_num: offset}, trailer
    bytes); None for truncated/malformed tables or xref STREAMS
    (PDF 1.5+ cross-reference streams — documented out of scope)."""
    tail = p[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass                                      # keep the LAST one
    if m is None:
        return None
    pos = int(m.group(1))
    if pos >= len(p) or not p[pos:pos + 4] == b"xref":
        return None                               # xref stream or junk
    cur = pos + 4
    offsets: dict[int, int] = {}
    while True:
        m2 = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", p[cur:cur + 64])
        if m2 is None:
            break
        start, count = int(m2.group(1)), int(m2.group(2))
        cur += m2.end()
        need = 20 * count
        if cur + need > len(p):
            return None                           # truncated entries
        for i in range(count):
            entry = p[cur + 20 * i: cur + 20 * (i + 1)]
            if entry[17:18] == b"n":
                offsets[start + i] = int(entry[:10])
        cur += need
    t = p.find(b"trailer", cur)
    if t < 0:
        return None
    return offsets, p[t: t + 512]


def _fetch_obj(p: bytes, offsets: dict[int, int], num: int
               ) -> Optional[bytes]:
    off = offsets.get(num)
    if off is None or off >= len(p):
        return None
    end = p.find(b"endobj", off)
    if end < 0:
        return None
    body = p[off:end]
    m = re.match(rb"\s*\d+\s+\d+\s+obj", body)
    return body[m.end():] if m else None


def parse_pdf_metadata(payload: bytes | None) -> dict | None:
    """Header + xref/trailer walk to ``{version, n_objects, n_pages}``
    or None for anything not a classic-xref PDF (bad header, xref
    stream, truncated table, missing catalog/pages)."""
    if payload is None or len(payload) < 16:
        return None
    p = bytes(payload)
    hm = re.match(rb"%PDF-(\d+\.\d+)", p)
    if hm is None:
        return None
    loaded = _load_xref(p)
    if loaded is None:
        return None
    offsets, trailer = loaded
    size = _dict_int(trailer, "Size")
    root = _dict_ref(trailer, "Root")
    if size is None or root is None:
        return None
    catalog = _fetch_obj(p, offsets, root)
    if catalog is None:
        return None
    pages_ref = _dict_ref(catalog, "Pages")
    pages = _fetch_obj(p, offsets, pages_ref) if pages_ref else None
    if pages is None:
        return None
    count = _dict_int(pages, "Count")
    if count is None:
        return None
    return {
        "version": hm.group(1).decode("ascii"),
        "n_objects": size - 1,
        "n_pages": count,
    }


# ---------------------------------------------------------------------------
# text extraction
# ---------------------------------------------------------------------------


_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_string(content: bytes, i: int) -> tuple[bytes, int]:
    """Decode the literal string starting at ``content[i] == b'('`` —
    full spec rules: nested balanced parens, named and octal escapes,
    escaped-newline continuation. Returns (decoded, end_index)."""
    n = len(content)
    depth = 1
    j = i + 1
    out = bytearray()
    while j < n and depth > 0:
        c = content[j:j + 1]
        if c == b"\\":
            nxt = content[j + 1:j + 2]
            if nxt in _STR_ESCAPES:
                out += _STR_ESCAPES[nxt]
                j += 2
            elif nxt.isdigit():
                k = j + 1
                oct_digits = b""
                while k < n and len(oct_digits) < 3 and \
                        content[k:k + 1] in b"01234567":
                    oct_digits += content[k:k + 1]
                    k += 1
                out.append(int(oct_digits, 8) & 0xFF)
                j = k
            elif nxt == b"\n":
                j += 2                            # line continuation
            else:
                j += 1                            # lone backslash: drop
        elif c == b"(":
            depth += 1
            out += c
            j += 1
        elif c == b")":
            depth -= 1
            if depth > 0:
                out += c
            j += 1
        else:
            out += c
            j += 1
    return bytes(out), j


_SHOW_OP_RE = re.compile(rb"\s*(Tj|')")


def _page_text(content: bytes) -> str:
    """Text-showing walk (linear state machine): ``(s) Tj`` and
    ``(s) '`` append s; a ``[(a) -120 (b)] TJ`` array appends its
    strings concatenated (kerning numbers dropped; a bracket group
    NOT closed by TJ contributes nothing). Everything else — layout,
    positioning — is ignored by policy."""
    parts: list[str] = []
    pending: list[str] = []
    in_array = False
    i = 0
    n = len(content)
    while i < n:
        c = content[i:i + 1]
        if c == b"(":
            raw, end = _parse_string(content, i)
            if in_array:
                pending.append(raw.decode("latin-1"))
            elif _SHOW_OP_RE.match(content, end):
                parts.append(raw.decode("latin-1"))
            i = end
        elif c == b"[":
            in_array = True
            pending = []
            i += 1
        elif c == b"]":
            if in_array and re.compile(rb"\s*TJ").match(content, i + 1):
                parts.extend(pending)
            in_array = False
            pending = []
            i += 1
        else:
            i += 1
    return "".join(parts)


def extract_pdf_text(payload: bytes | None) -> Optional[str]:
    """Document text: per page in ``/Kids`` order, the ``/Contents``
    stream (inflated when ``/FlateDecode``) through the text-showing
    walk; pages joined by newline. None for anything
    :func:`parse_pdf_metadata` rejects or a page/stream that does not
    resolve."""
    if payload is None:
        return None
    p = bytes(payload)
    meta = parse_pdf_metadata(p)
    if meta is None:
        return None
    loaded = _load_xref(p)
    offsets, trailer = loaded
    catalog = _fetch_obj(p, offsets, _dict_ref(trailer, "Root"))
    pages_obj = _fetch_obj(p, offsets, _dict_ref(catalog, "Pages"))
    kids_m = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    if kids_m is None:
        return None
    kid_nums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R",
                                           kids_m.group(1))]
    page_texts: list[str] = []
    for num in kid_nums:
        page = _fetch_obj(p, offsets, num)
        if page is None:
            return None
        cref = _dict_ref(page, "Contents")
        cobj = _fetch_obj(p, offsets, cref) if cref else None
        if cobj is None:
            return None
        sm = re.search(rb"stream\r?\n", cobj)
        if sm is None:
            return None
        send = cobj.rfind(b"endstream")
        data = cobj[sm.end():send]
        if data.endswith(b"\n"):
            data = data[:-1]
        if b"/FlateDecode" in cobj[:sm.start()]:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
        page_texts.append(_page_text(data))
    return "\n".join(page_texts)


PDF_TEXT_SCHEMA = (
    "id long, valid boolean, version string, n_pages int, "
    "n_objects int, text string"
)


def pdf_text_frame(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Arrow-batched PDF metadata + text extraction — one pass yields
    both tiers (metadata fields AND the extracted text), row-local,
    zero shuffles, corrupt → valid=false."""
    id_name, payload_name = id_col, payload_col

    def one(payload):
        p = None if payload is None else bytes(payload)
        meta = parse_pdf_metadata(p)
        if meta is None:
            return (False, None, None, None, None)
        text = extract_pdf_text(p)
        return (
            True, meta["version"], meta["n_pages"], meta["n_objects"],
            text,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = [
                (rid, *one(payload))
                for rid, payload in zip(
                    pdf_b[id_name], pdf_b[payload_name]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "valid", "version", "n_pages", "n_objects",
                    "text",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=PDF_TEXT_SCHEMA
    )


def read_pdf(spark, path: str) -> DataFrame:
    """Directory of ``*.pdf`` → documents-shaped frame ``(doc_id,
    path, valid, version, n_pages, text)`` via a binaryFile scan +
    :func:`pdf_text_frame` — the WARC/WET ingestion precedent
    (sources/warc.py) for the PDF half of a crawl. doc_id is a stable
    64-bit hash of the file path (xxhash64), the same identity rule
    read_wet uses for URI-keyed corpora."""
    from pyspark.sql import functions as F

    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.xxhash64(F.col("path")).alias("doc_id"),
            F.col("path"),
            F.col("content"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid, pth, payload in zip(
                b["doc_id"], b["path"], b["content"]
            ):
                p = None if payload is None else bytes(payload)
                meta = parse_pdf_metadata(p)
                if meta is None:
                    rows.append((rid, pth, False, None, None, None, None))
                else:
                    rows.append((
                        rid, pth, True, meta["version"],
                        meta["n_pages"], meta["n_objects"],
                        extract_pdf_text(p),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "path", "valid", "version", "n_pages",
                    "n_objects", "text",
                ],
            )

    return bins.mapInPandas(
        run,
        schema=(
            "doc_id long, path string, valid boolean, version string,"
            " n_pages int, n_objects int, text string"
        ),
    )
