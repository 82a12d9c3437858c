"""GIF decode (SURVEY §2.F52, round 12) — the third real image codec
(after PNG and baseline+progressive JPEG), closing the last common
web-image format in the multimodal surface: GIF is a large share of
crawl images and THE animated-meme container, exactly the corpus the
image dedup (F47) targets. Beyond-reference; the format is public
(GIF87a/89a specification, CompuServe 1987/1990).

Pure Python + numpy like `operators/jpeg.py`: marker-free block walk
(logical screen descriptor → extensions → image descriptors →
trailer), global/local color tables, variable-width LSB-first LZW with
the spec's early-change width rule, Adam-style 4-pass GIF interlace,
frame COUNT for animations with first-frame pixel decode (metadata
profiling needs count + a representative frame, not a full animation
render — same policy as AVI's frame sampler). An in-repo `encode_gif`
(real LZW compressor) exists for fixtures; `encode_gif_uncompressed`
(literal codes + periodic clears, the classic "uncompressed GIF"
technique) gives the decoder an INDEPENDENT encoding path so the
round-trip tests don't share table logic between the two sides.

Corrupt payload contract (repo-wide): any malformed structure → the
decode functions return ``None``; they never raise out of the kernel.

Scale note: LZW is inherently sequential per image — this is a
per-byte Python loop on the ~KB fixture scale, the same declared cost
class as the original JPEG Huffman loop; a deployment needing bulk GIF
throughput swaps this one module for giflib bindings without touching
the Spark surface (the `multimodal` kernels only call
``decode_gif``)."""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: GIF interlace passes: (row_start, row_step) — spec appendix E.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_WIDTH = 12  # LZW code width ceiling (spec: 12 bits)


class _BitReader:
    """LSB-first bit reader over the concatenated LZW sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_decode(data: bytes, mcs: int, n_pixels: int) -> bytes | None:
    """GIF-flavor LZW: variable width starting at ``mcs``+1, LSB-first,
    clear/end codes, early-change width bump (the decoder grows its
    width one table entry BEFORE the encoder's power-of-two boundary —
    its table lags the encoder's by exactly one entry). Stops after
    ``n_pixels`` output bytes (trailing junk tolerated, spec behavior);
    returns None on a malformed stream."""
    if not (2 <= mcs <= 11):
        return None
    clear = 1 << mcs
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    rd = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = rd.read(width)
        if code is None:
            return None
        if code == clear:
            table = list(roots) + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if not table:
            # stream may legally omit nothing: first code must follow
            # a clear per spec; tolerate by implicit reset
            table = list(roots) + [b"", b""]
        if code < len(table):
            entry = table[code]
            if not entry:
                return None  # clear/end slot referenced
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        if prev is not None and len(table) < (1 << _MAX_WIDTH):
            table.append(prev + entry[:1])
            # the decoder's table lags the encoder's by one entry, so
            # its width bump fires at len == 2^w just as the encoder's
            # fires at next_code == 2^w + 1 — same stream position
            if len(table) == (1 << width) and width < _MAX_WIDTH:
                width += 1
        out += entry
        prev = entry
    return bytes(out[:n_pixels]) if len(out) >= n_pixels else None


def lzw_encode(data: bytes, mcs: int) -> bytes:
    """Real GIF LZW compressor (fixture/writer side): eager table,
    width bump at the power-of-two boundary, clear-and-reset before
    the 12-bit table fills."""
    clear = 1 << mcs
    end = clear + 1
    wr = _BitWriter()
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    wr.write(clear, width)
    buf = b""
    for ch in data:
        nb = buf + bytes([ch])
        if nb in table:
            buf = nb
            continue
        wr.write(table[buf], width)
        table[nb] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
            width += 1
        if next_code >= (1 << _MAX_WIDTH) - 1:
            wr.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        buf = bytes([ch])
    if buf:
        wr.write(table[buf], width)
    wr.write(end, width)
    return wr.done()


def encode_gif_uncompressed(data: bytes, mcs: int) -> bytes:
    """The classic "uncompressed GIF" stream: every pixel a literal
    root code, a clear code before each width bump would be due — an
    independent encoding path (no string table) used to pin the
    decoder separately from :func:`lzw_encode`."""
    clear = 1 << mcs
    end = clear + 1
    wr = _BitWriter()
    width = mcs + 1
    wr.write(clear, width)
    # the decoder adds one table entry per literal from the second
    # literal after a clear; clearing after (2^width - end - 1)
    # literals keeps its table strictly below the 2^width bump, so the
    # whole stream (clears included) stays at the initial width
    cycle = (1 << width) - end - 1
    budget = cycle
    for ch in data:
        if budget == 0:
            wr.write(clear, width)
            budget = cycle
        wr.write(ch, width)
        budget -= 1
    wr.write(end, width)
    return wr.done()


def _pack_sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int] | None:
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            return None
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            return None
        out += data[pos : pos + size]
        pos += size


def encode_gif(
    indices: np.ndarray,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
    n_frames: int = 1,
    uncompressed: bool = False,
) -> bytes:
    """Serialize an index raster as a real single- or multi-frame GIF
    (a viewer opens the bytes). ``palette`` defaults to the 256-entry
    gray ramp (palette[i] = (i,i,i) — the fixture contract: luma ≡
    index). ``n_frames`` > 1 repeats the same raster as an
    animation's frames (frame-count decode pinning). ``interlace``
    stores the rows in GIF 4-pass order."""
    h, w = indices.shape
    if palette is None:
        palette = [(i, i, i) for i in range(256)]
    n_pal = len(palette)
    pal_bits = max(1, (n_pal - 1).bit_length())
    pal_size = 1 << pal_bits
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes((r, g, b))
    gct += b"\x00" * (3 * (pal_size - n_pal))
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 7), 0, 0
    ) + bytes(gct)
    if interlace:
        order = [
            r
            for start, step in _GIF_INTERLACE
            for r in range(start, h, step)
        ]
        raster = np.ascontiguousarray(indices[order, :])
    else:
        raster = indices
    data = raster.astype(np.uint8).tobytes()
    mcs = max(2, pal_bits)
    lzw = (
        encode_gif_uncompressed(data, mcs)
        if uncompressed
        else lzw_encode(data, mcs)
    )
    frame = (
        b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([mcs])
        + _pack_sub_blocks(lzw)
    )
    body = bytearray()
    if n_frames > 1:
        # graphic-control extension per frame, minimal animation
        gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        for _ in range(n_frames):
            body += gce + frame
    else:
        body += frame
    return head + bytes(body) + b"\x3b"


def decode_gif(payload: bytes | None):
    """Parse a GIF: returns ``(width, height, n_frames, interlaced,
    indices, palette)`` where ``indices`` is the FIRST frame's H×W
    uint8 index raster (de-interlaced) and ``palette`` the color table
    rows it indexes (local table if the frame has one). ``None`` for
    any malformed payload."""
    if payload is None or len(payload) < 13 or payload[:6] not in GIF_MAGICS:
        return None
    try:
        w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    except struct.error:
        return None
    pos = 13
    n = len(payload)
    gct = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 7))
        if pos + size > n:
            return None
        gct = np.frombuffer(payload[pos : pos + size], np.uint8).reshape(-1, 3)
        pos += size
    n_frames = 0
    first = None
    first_interlaced = False
    first_pal = None
    while pos < n:
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            if pos >= n:
                return None
            pos += 1
            got = _read_sub_blocks(payload, pos)
            if got is None:
                return None
            _, pos = got
            continue
        if b0 != 0x2C:
            return None
        if pos + 9 > n:
            return None
        fx, fy, fw, fh, fpack = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        pal = gct
        if fpack & 0x80:
            size = 3 * (2 << (fpack & 7))
            if pos + size > n:
                return None
            pal = np.frombuffer(
                payload[pos : pos + size], np.uint8
            ).reshape(-1, 3)
            pos += size
        if pos >= n:
            return None
        mcs = payload[pos]
        pos += 1
        got = _read_sub_blocks(payload, pos)
        if got is None:
            return None
        lzw, pos = got
        n_frames += 1
        if first is None:
            if pal is None or fw == 0 or fh == 0:
                return None
            raw = lzw_decode(lzw, mcs, fw * fh)
            if raw is None:
                return None
            raster = np.frombuffer(raw, np.uint8).reshape(fh, fw)
            interlaced = bool(fpack & 0x40)
            if interlaced:
                out = np.empty_like(raster)
                src = 0
                for start, step in _GIF_INTERLACE:
                    rows = range(start, fh, step)
                    for r in rows:
                        out[r] = raster[src]
                        src += 1
                raster = out
            if int(raster.max(initial=0)) >= len(pal):
                return None
            # frames smaller than the logical screen render at their
            # own geometry for profiling (fx/fy offsets are a
            # compositing concern, not a metadata one)
            first = raster
            first_interlaced = interlaced
            first_pal = pal
    if first is None:
        return None
    return (
        int(first.shape[1]),
        int(first.shape[0]),
        n_frames,
        first_interlaced,
        first,
        first_pal,
    )


def gif_mean_luma(decoded) -> float | None:
    """Mean of the palette-mapped per-pixel luma ``(r+g+b)/3`` — an
    exact integer-sum + one-division contract (for the gray fixture
    palette this is exactly the mean index, the PNG closed form)."""
    if decoded is None:
        return None
    _w, _h, _nf, _il, idx, pal = decoded
    sums = pal.astype(np.int64).sum(axis=1)  # r+g+b per palette slot
    total = int(sums[idx.reshape(-1)].sum())
    return total / (3.0 * idx.size)
