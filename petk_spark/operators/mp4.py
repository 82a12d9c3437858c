"""MP4 / ISO-BMFF container metadata (round 15, F62 — r14 verdict #1;
round 16 adds stsd codec identification).

Crawl video is overwhelmingly MP4, and until this round every MP4
payload routed to ``'unknown'`` in :func:`multimodal.media_features_auto`.
Same metadata-not-full-decode policy as MP3/FLAC (F57/F58): a box walk
to closed-form integer fields — ftyp major brand, mvhd timescale +
duration (both version-0 32-bit and version-1 64-bit layouts), trak
count, the first video trak's tkhd 16.16 fixed-point dimensions, and
— round 16 (r15 verdict #6) — the **stsd sample-entry codec tag**
(``avc1``/``hev1``/``mp4a``/…, the field a video-corpus curator
filters on first) via the trak → mdia → minf → stbl → stsd descent.
Sample decode (stbl sample tables / mdat) stays out of scope by
policy — the documented swap seam for a real demuxer, exactly like
the MP3 side-info and FLAC subframe seams.

Box grammar (ISO/IEC 14496-12, public): ``size(4,BE) type(4)``;
``size == 1`` → a 64-bit largesize follows the type; ``size == 0`` →
box extends to end of file. Full boxes (mvhd/tkhd/stsd) carry
``version(1) flags(3)`` first.

Reference parity: the reference engine is tabular-only
(``/root/reference/petk/exploration.py`` profiles dataframe columns;
no binary surface anywhere in ``petk/``) — declared beyond-reference,
same as every other media kind.

Scale: row-local Arrow kernel over ``mapInPandas`` — zero shuffles,
corrupt/truncated payloads → ``valid=false`` rows, never task failure.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_mp4",
    "parse_mp4_metadata",
    "mp4_features_frame",
    "MP4_FEATURES_SCHEMA",
]


# ---------------------------------------------------------------------------
# synthesis (fixture tier): a genuine box writer, not captured bytes —
# every field the parser reads is an argument, so the registry's
# oracle replays them closed-form.
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
    """One ISO-BMFF box. ``largesize=True`` emits the size==1 64-bit
    header form (pins the largesize branch of the walker)."""
    if largesize:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(body)
        ) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(version: int, flags: int = 0) -> bytes:
    return bytes([version]) + flags.to_bytes(3, "big")


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = _full(1) + struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = _full(0) + struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">i", 0x00010000)        # rate 1.0
    body += struct.pack(">h", 0x0100)            # volume 1.0
    body += b"\x00" * 10                         # reserved
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                        0x40000000)              # unity matrix
    body += b"\x00" * 24                         # pre_defined
    body += struct.pack(">I", 0xFFFFFFFF)        # next_track_ID
    return _box(b"mvhd", body)


def _tkhd(version: int, track_id: int, duration: int,
          width: int, height: int) -> bytes:
    if version == 1:
        body = _full(1, 0x7) + struct.pack(
            ">QQI", 0, 0, track_id
        ) + b"\x00" * 4 + struct.pack(">Q", duration)
    else:
        body = _full(0, 0x7) + struct.pack(
            ">III", 0, 0, track_id
        ) + b"\x00" * 4 + struct.pack(">I", duration)
    body += b"\x00" * 8                          # reserved
    body += struct.pack(">hhh", 0, 0, 0)         # layer, group, volume
    body += b"\x00" * 2                          # reserved
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                        0x40000000)
    body += struct.pack(">II", width << 16, height << 16)  # 16.16
    return _box(b"tkhd", body)


def _mdia(codec: Optional[bytes], lang: Optional[str] = None) -> bytes:
    """A minimal ``mdia`` box: an ``mdhd`` (when ``lang`` is given —
    the packed 15-bit ISO-639-2/T code, 3 × 5-bit letters biased by
    0x60) and a ``minf → stbl → stsd`` chain with ONE sample entry of
    the given 4-char codec tag (6 reserved bytes + data reference
    index — the common SampleEntry head all formats share;
    format-specific tails are demuxer scope)."""
    inner = b""
    if lang is not None:
        code = 0
        for ch in lang:
            code = (code << 5) | (ord(ch) - 0x60)
        inner += _box(
            b"mdhd",
            _full(0) + struct.pack(">IIIIHH", 0, 0, 1000, 0, code, 0),
        )
    if codec is not None:
        entry = _box(bytes(codec), b"\x00" * 6 + struct.pack(">H", 1))
        stsd = _box(b"stsd", _full(0) + struct.pack(">I", 1) + entry)
        inner += _box(b"minf", _box(b"stbl", stsd))
    return _box(b"mdia", inner)


def synth_mp4(
    brand: bytes,
    timescale: int,
    duration_units: int,
    track_dims: Sequence[Optional[tuple]],
    version: int = 0,
    with_free: bool = False,
    moov_largesize: bool = False,
    track_codecs: Optional[Sequence[Optional[bytes]]] = None,
    track_langs: Optional[Sequence[Optional[str]]] = None,
) -> bytes:
    """Minimal valid ISO-BMFF file: ``ftyp`` + optional ``free`` (the
    walker must step over it) + ``moov`` (mvhd + one trak/tkhd per
    entry of ``track_dims`` — ``(w, h)`` for a video trak, ``None``
    for a non-video trak whose tkhd carries 0×0) + a stub ``mdat``.
    ``version`` selects the 32-/64-bit mvhd+tkhd layouts;
    ``moov_largesize`` emits moov with the size==1 64-bit header;
    ``track_codecs`` (round 16) adds a real stsd sample entry with the
    given 4-char tag under each non-None trak; ``track_langs`` an
    mdhd with the packed ISO-639-2/T language code."""
    ftyp = _box(b"ftyp", bytes(brand) + struct.pack(">I", 0)
                + bytes(brand) + b"isom")
    traks = b""
    for i, dims in enumerate(track_dims):
        w, h = dims if dims is not None else (0, 0)
        body = _tkhd(version, i + 1, duration_units, w, h)
        codec = track_codecs[i] if track_codecs is not None else None
        lang = track_langs[i] if track_langs is not None else None
        if codec is not None or lang is not None:
            body += _mdia(codec, lang)
        traks += _box(b"trak", body)
    moov = _box(
        b"moov",
        _mvhd(version, timescale, duration_units) + traks,
        largesize=moov_largesize,
    )
    out = ftyp
    if with_free:
        out += _box(b"free", b"\x00" * 12)
    out += moov
    out += _box(b"mdat", b"\x00" * 8)
    return out


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for each well-formed box
    in ``buf[start:end]``; stops (without raising) at the first
    malformed/truncated header so callers see a partial walk."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        btype = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:                          # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            return                               # truncated / malformed
        yield btype, pos + hdr, pos + size
        pos += size


def _mdhd_language(p: bytes, bs: int, be: int) -> Optional[str]:
    """The ISO-639-2/T language of an ``mdia`` box body's mdhd, or
    None: the packed 15-bit code (3 × 5-bit letters biased 0x60) at
    body offset 20 (version 0: fullbox 4 + 4×u32) / 32 (version 1:
    fullbox 4 + 2×u64 + u32 + u64); the 0-code and out-of-range
    letters return None."""
    for t3, ms, me in _walk_boxes(p, bs, be):
        if t3 != b"mdhd":
            continue
        if me - ms < 4:
            return None
        off = ms + (32 if p[ms] == 1 else 20)
        if off + 2 > me:
            return None
        code = int.from_bytes(p[off:off + 2], "big") & 0x7FFF
        chars = [
            ((code >> shift) & 0x1F) + 0x60 for shift in (10, 5, 0)
        ]
        if all(0x61 <= c <= 0x7A for c in chars):
            return bytes(chars).decode("ascii")
        return None
    return None


def _stsd_codec(p: bytes, bs: int, be: int) -> Optional[str]:
    """The 4-char format tag of the FIRST stsd sample entry under an
    ``mdia`` box body (``minf → stbl → stsd`` descent), or None when
    the chain/entry is absent or short. stsd body: version+flags(4) +
    entry_count(4) + entries, each a box whose type IS the codec."""
    for t3, ms, me in _walk_boxes(p, bs, be):
        if t3 != b"minf":
            continue
        for t4, fs, fe in _walk_boxes(p, ms, me):
            if t4 != b"stbl":
                continue
            for t5, ss, se in _walk_boxes(p, fs, fe):
                if t5 != b"stsd":
                    continue
                if se - ss < 8:
                    return None
                count = int.from_bytes(p[ss + 4:ss + 8], "big")
                if count < 1:
                    return None
                for t6, _es, _ee in _walk_boxes(p, ss + 8, se):
                    tag = t6.decode("latin-1")
                    return tag if tag.strip() else None
                return None
    return None


def parse_mp4_metadata(payload: bytes | None) -> dict | None:
    """Top-level box walk to ``{brand, timescale, duration_ms,
    n_tracks, width, height}`` — or ``None`` for anything that is not
    a well-formed BMFF head: no leading ``ftyp``, missing/short mvhd,
    zero timescale, truncated moov. Width/height come from the first
    trak whose tkhd has nonzero 16.16 dimensions (the video trak);
    audio-only files report NULL dims but stay valid. ``codec`` is the
    stsd sample-entry tag of the first VIDEO trak, falling back to the
    first trak carrying any stsd (the audio tag for audio-only files);
    None when no stsd resolves (pre-round-16 fixtures, stripped
    moovs)."""
    if payload is None or len(payload) < 16:
        return None
    p = bytes(payload)
    if p[4:8] != b"ftyp":
        return None
    brand = None
    moov = None
    for btype, bs, be in _walk_boxes(p, 0, len(p)):
        if btype == b"ftyp":
            if be - bs < 8:
                return None
            brand = p[bs:bs + 4].decode("latin-1")
        elif btype == b"moov":
            moov = (bs, be)
            break
    if brand is None or moov is None:
        return None
    timescale = duration = mvhd_version = None
    n_tracks = 0
    width = height = None
    codec_video = codec_first = None
    lang_video = lang_first = None
    for btype, bs, be in _walk_boxes(p, moov[0], moov[1]):
        if btype == b"mvhd":
            if be - bs < 4:
                return None
            ver = mvhd_version = p[bs]
            if ver == 1:
                if be - bs < 4 + 28:
                    return None
                timescale = int.from_bytes(p[bs + 20:bs + 24], "big")
                duration = int.from_bytes(p[bs + 24:bs + 32], "big")
            else:
                if be - bs < 4 + 16:
                    return None
                timescale = int.from_bytes(p[bs + 12:bs + 16], "big")
                duration = int.from_bytes(p[bs + 16:bs + 20], "big")
        elif btype == b"trak":
            n_tracks += 1
            is_video = False
            for t2, ts2, te2 in _walk_boxes(p, bs, be):
                if t2 == b"tkhd":
                    # length check BEFORE any body read: an empty tkhd
                    # whose boundary coincides with end-of-file used to
                    # IndexError on p[ts2] (r15 ADVICE). Width/height
                    # are the LAST 8 bytes in both layouts (spec body:
                    # 84 bytes v0, 96 v1).
                    if te2 - ts2 < 84:
                        continue
                    ver = p[ts2]
                    if te2 - ts2 < (84 if ver == 0 else 96):
                        continue
                    w = int.from_bytes(p[te2 - 8:te2 - 4], "big") >> 16
                    h = int.from_bytes(p[te2 - 4:te2], "big") >> 16
                    if w > 0 and h > 0:
                        is_video = True
                        if width is None:
                            width, height = w, h
                elif t2 == b"mdia":
                    tag = _stsd_codec(p, ts2, te2)
                    if tag is not None:
                        if codec_first is None:
                            codec_first = tag
                        if is_video and codec_video is None:
                            codec_video = tag
                    lng = _mdhd_language(p, ts2, te2)
                    if lng is not None:
                        if lang_first is None:
                            lang_first = lng
                        if is_video and lang_video is None:
                            lang_video = lng
    if timescale is None or timescale == 0 or duration is None:
        return None
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "mvhd_version": mvhd_version,
        "codec": codec_video or codec_first,
        "language": lang_video or lang_first,
    }


MP4_FEATURES_SCHEMA = (
    "id long, valid boolean, brand string, timescale int, "
    "duration_ms long, n_tracks int, width int, height int, "
    "mvhd_version int, codec string, language string"
)


def mp4_features_frame(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Arrow-batched BMFF metadata extraction — the MP3/FLAC sibling:
    row-local, zero shuffles, corrupt payloads → valid=false rows."""
    id_name, payload_name = id_col, payload_col

    def one(payload):
        meta = parse_mp4_metadata(
            None if payload is None else bytes(payload)
        )
        if meta is None:
            return (False,) + (None,) * 10
        return (
            True, meta["brand"], meta["timescale"], meta["duration_ms"],
            meta["n_tracks"], meta["width"], meta["height"],
            meta["mvhd_version"], meta["codec"], meta["language"],
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (rid, *one(payload))
                for rid, payload in zip(pdf[id_name], pdf[payload_name])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "valid", "brand", "timescale", "duration_ms",
                    "n_tracks", "width", "height", "mvhd_version",
                    "codec", "language",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=MP4_FEATURES_SCHEMA
    )
