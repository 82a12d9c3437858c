"""VP8L (WebP lossless) pixel codec (round 13 — upgrades F56 from
container-metadata-only to REAL pixel decode for the lossless
variant, the same closure the GIF/JPEG/PNG codecs got in earlier
rounds). Pure Python + numpy, public-spec implementation (RFC 9649
§3, "Specification for the WebP Lossless Bitstream").

Decoder surface:

* canonical prefix codes — both the SIMPLE form (1-2 direct symbols)
  and the full code-length-coded form (DEFLATE-style: a code-length
  alphabet of 19 with repeat codes 16/17/18, optional max-symbol
  limit field);
* the five-code groups (green+length+cache / red / blue / alpha /
  distance), optional META prefix image (a recursively entropy-coded
  subresolution image selecting code groups per block);
* LZ77 backward references (length/distance prefix values with extra
  bits) including the 2D distance-map for codes ≤ 120 and the
  verbatim form above it;
* the color cache (0x1e35a7bd multiplicative hash, every emitted
  pixel inserted);
* transform inverses: SUBTRACT_GREEN, COLOR_INDEXING (delta-coded
  palette + sub-byte index bundling), COLOR (per-block
  ColorTransformElement deltas), and PREDICTOR (14 modes).

Encoder (fixture tier, like `encode_gif` / `encode_baseline_jpeg`):
SUBTRACT_GREEN + per-channel canonical Huffman literals — no LZ77, no
cache, no meta — which the decoder must consume through its GENERAL
code paths; gray constant-row rasters replay the PNG/GIF closed-form
mean in the oracle.

Conformance note (declared): the container/headers and the prefix,
LZ77-verbatim, cache, subtract-green and palette paths follow the RFC
text directly; the 120-entry 2D distance map and the predictor edge
conventions are transcribed from the spec as well but no conformance
corpus exists in this environment to cross-check them, so they are
additionally pinned by hand-built bitstream tests and excluded from
the oracle fixtures (which use verbatim distances / no predictor).
Corrupt or truncated payloads return ``None`` — never an exception —
matching the repo-wide codec contract.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O — LSB-first within each byte (the VP8L convention)
# ---------------------------------------------------------------------------


class _Corrupt(Exception):
    pass


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        # Bulk extract (round 16, guide §4.2): LSB-first bits p..p+n-1
        # as one little-endian slice-int — value-identical to the
        # former per-bit loop, same _Corrupt condition (any needed bit
        # past the end; pos uncommitted on raise).
        p = self.pos
        if p + n > self.nbits:
            raise _Corrupt("bit read past end")
        out = (
            int.from_bytes(self.data[p >> 3 : (p + n + 7) >> 3], "little")
            >> (p & 7)
        ) & ((1 << n) - 1)
        self.pos = p + n
        return out

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise _Corrupt("bit read past end")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def peek(self, n: int) -> int:
        """Next ``n`` stream bits LSB-first WITHOUT advancing,
        zero-padded past end-of-data (used by the table-driven prefix
        decode, which checks the true available-bit budget itself)."""
        p = self.pos
        return (
            int.from_bytes(self.data[p >> 3 : (p + n + 7) >> 3], "little")
            >> (p & 7)
        ) & ((1 << n) - 1)


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code write: MSB of the code first (the mirror of the
        decoder's walk)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment (numerically
    increasing codes within a length, lengths ascending — the DEFLATE
    convention the spec references)."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class PrefixDecoder:
    """Decode one symbol by walking bits (first bit read = MSB of the
    canonical code). ``direct`` is the simple-code form: code VALUES
    0/1 map to the symbols in the order they were read."""

    def __init__(self, lengths: list[int] | None = None,
                 direct: list[int] | None = None):
        if direct is not None:
            self.single = direct[0] if len(direct) == 1 else None
            self.table = (
                {} if self.single is not None
                else {(1, 0): direct[0], (1, 1): direct[1]}
            )
            if self.single is None:
                self.maxlen = 1
                self.tab = [(direct[0], 1), (direct[1], 1)]
            return
        assert lengths is not None
        nz = [l for l in lengths if l > 0]
        if len(nz) == 0:
            raise _Corrupt("empty prefix code")
        if len(nz) == 1:
            # the sole symbol is the one with the nonzero length
            self.single = next(s for s, l in enumerate(lengths) if l)
            self.table = {}
            return
        # completeness (Kraft equality) — libwebp rejects incomplete
        # codes; so do we
        if sum(2 ** (15 - l) for l in nz) != 2 ** 15:
            raise _Corrupt("incomplete prefix code")
        self.single = None
        self.table = {
            (l, c): s for s, (c, l) in canonical_codes(lengths).items()
        }
        # Flat lookup table (round 16, guide §4.2): the former
        # bit-at-a-time walk paid a dict probe PER BIT per symbol —
        # the dominant cost of the whole VP8L decode in the media
        # twin's UDF profile. Index = the next ``maxlen`` stream bits
        # LSB-first (first-read bit = bit 0), i.e. exactly
        # ``BitReader.peek(maxlen)``; each entry is (symbol, length).
        # Kraft completeness (checked above) guarantees the table is
        # fully populated, so a decode resolves in one probe and
        # consumes the identical bits the walk did.
        maxlen = max(nz)
        self.maxlen = maxlen
        tab: list = [None] * (1 << maxlen)
        for (l, c), s in self.table.items():
            rev = 0
            cc = c
            for _ in range(l):
                rev = (rev << 1) | (cc & 1)
                cc >>= 1
            for idx in range(rev, 1 << maxlen, 1 << l):
                tab[idx] = (s, l)
        self.tab = tab

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        p = br.pos
        got = self.tab[br.peek(self.maxlen)]
        if got is None:  # unreachable for complete codes; guard kept
            raise _Corrupt("prefix walk exceeded 15 bits")
        s, l = got
        if l > br.nbits - p:
            raise _Corrupt("bit read past end")
        br.pos = p + l
        return s


#: code-length-code transmission order (RFC 9649)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixDecoder:
    if br.read_bit():                       # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():                   # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise _Corrupt("simple-code symbol out of range")
        return PrefixDecoder(direct=syms)
    # code-length-coded form
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = PrefixDecoder(lengths=cl_lengths)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.decode(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            repeat = 3 + br.read(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise _Corrupt("code-length repeat overflow")
                lengths[symbol] = prev
                symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:                               # 18
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise _Corrupt("code-length overflow")
    return PrefixDecoder(lengths=lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(br: BitReader, code: int) -> int:
    """length/distance prefix decoding: codes 0-3 are direct values
    1-4; above, (2 + lsb) << extra plus extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


#: 2D distance map for dist codes 1..120 — (xoffset, yoffset) pairs in
#: the spec's order (closest neighbors first, x ties left-positive).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image decode
# ---------------------------------------------------------------------------

_HASH_MUL = 0x1E35A7BD


def _decode_entropy_image(
    br: BitReader, w: int, h: int, is_level0: bool
):
    """Decode one entropy-coded image → np.uint32 array (h, w) of
    ARGB, applying NO transforms (the caller does). ``is_level0``
    allows the meta prefix image (the spec's recursion gate)."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise _Corrupt("bad color cache size")
    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = (
            ((meta_img >> 8) & 0xFFFF)      # (red << 8) | green
        ).astype(np.int64)
        num_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gc, rc, bc, ac, dc = groups[gi]
        else:
            gc, rc, bc, ac, dc = groups[0]
        s = gc.decode(br)
        if s < 256:                          # literal
            red = rc.decode(br)
            blue = bc.decode(br)
            alpha = ac.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[(px * _HASH_MUL & 0xFFFFFFFF) >> shift] = px
            pos += 1
        elif s < 256 + 24:                   # backward reference
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, dc.decode(br))
            dist = _map_distance(dist_code, w)
            if dist > pos or pos + length > total:
                raise _Corrupt("backref out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_bits:
                    cache[(px * _HASH_MUL & 0xFFFFFFFF) >> shift] = px
                pos += 1
        else:                                # color cache hit
            idx = s - 256 - 24
            if idx >= cache_size:
                raise _Corrupt("cache index out of range")
            px = cache[idx]
            out[pos] = px
            pos += 1
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def _split_argb(img: np.ndarray):
    a = (img >> 24) & 0xFF
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    return (x.astype(np.int32) for x in (a, r, g, b))


def _join_argb(a, r, g, b) -> np.ndarray:
    return (
        ((a & 0xFF).astype(np.uint32) << 24)
        | ((r & 0xFF).astype(np.uint32) << 16)
        | ((g & 0xFF).astype(np.uint32) << 8)
        | (b & 0xFF).astype(np.uint32)
    )


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a, r, g, b = _split_argb(img)
    return _join_argb(a, r + g, g, b + g)


def _ctd(t: np.ndarray | int, c: np.ndarray | int):
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = np.asarray(t, dtype=np.int64)
    cs = np.asarray(c, dtype=np.int64)
    ts = np.where(ts >= 128, ts - 256, ts)
    cs = np.where(cs >= 128, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, sub: np.ndarray,
                         bits: int) -> np.ndarray:
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w]
    cte = sub[ys >> bits, xs >> bits]
    g2r = cte & 0xFF                 # blue channel of the element
    g2b = (cte >> 8) & 0xFF          # green channel
    r2b = (cte >> 16) & 0xFF         # red channel
    a, r, g, b = _split_argb(img)
    r = (r + _ctd(g2r, g)) & 0xFF
    b = (b + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
    return _join_argb(a, r, g, b)


def _avg2(p1: int, p2: int) -> int:
    return (
        ((((p1 >> 24) & 0xFF) + ((p2 >> 24) & 0xFF)) // 2) << 24
        | ((((p1 >> 16) & 0xFF) + ((p2 >> 16) & 0xFF)) // 2) << 16
        | ((((p1 >> 8) & 0xFF) + ((p2 >> 8) & 0xFF)) // 2) << 8
        | ((((p1) & 0xFF) + ((p2) & 0xFF)) // 2)
    )


def _clamp_add_sub_full(c1: int, c2: int, c3: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((c1 >> sh) & 0xFF) + ((c2 >> sh) & 0xFF) - ((c3 >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _clamp_add_sub_half(c1: int, c2: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (c1 >> sh) & 0xFF
        c = (c2 >> sh) & 0xFF
        # (ave - c) / 2 with C truncation-toward-zero semantics (the
        # spec's integer division) — floor division is off by one for
        # negative odd differences and the clip does not mask it
        d = ave - c
        v = ave + (d // 2 if d >= 0 else -((-d) // 2))
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    pl = pt = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p = lc + tc - tlc
        pl += abs(p - lc)
        pt += abs(p - tc)
    return l if pl < pt else t


def _inv_predictor(img: np.ndarray, sub: np.ndarray,
                   bits: int) -> np.ndarray:
    """Inverse prediction (edge conventions per the lossless spec:
    (0,0) predicted by opaque black; rest of row 0 by LEFT; column 0
    by TOP; the TR-pixel of the rightmost column is the LEFTMOST pixel
    of the CURRENT row — already decoded, spec §"Predictor Transform";
    fixed in round 15 from the row-above convention per ADVICE)."""
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                mode = int((sub[y >> bits, x >> bits] >> 8) & 0xFF)
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(
                    out[y, 0]
                )
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(left, top), tl)
                else:
                    raise _Corrupt("bad predictor mode")
            px = int(out[y, x])
            out[y, x] = (
                (((px >> 24) + (pred >> 24)) & 0xFF) << 24
                | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF)
                << 16
                | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
            )
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def decode_vp8l(chunk: bytes):
    """Decode a VP8L chunk body → ``(width, height, alpha_used,
    pixels)`` with pixels ``(h, w, 4)`` uint8 RGBA, or ``None`` on any
    corruption."""
    try:
        if len(chunk) < 5 or chunk[0] != 0x2F:
            return None
        br = BitReader(chunk[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        alpha_used = br.read_bit()
        version = br.read(3)
        if version != 0:
            return None

        transforms = []
        seen = set()
        xsize = w
        while br.read_bit():
            t = br.read(2)
            if t in seen:
                raise _Corrupt("duplicate transform")
            seen.add(t)
            if t == 0:                       # PREDICTOR
                bits = 2 + br.read(3)
                sw = (xsize + (1 << bits) - 1) >> bits
                sh = (h + (1 << bits) - 1) >> bits
                sub = _decode_entropy_image(br, sw, sh, False)
                transforms.append(("pred", bits, sub))
            elif t == 1:                     # COLOR
                bits = 2 + br.read(3)
                sw = (xsize + (1 << bits) - 1) >> bits
                sh = (h + (1 << bits) - 1) >> bits
                sub = _decode_entropy_image(br, sw, sh, False)
                transforms.append(("color", bits, sub))
            elif t == 2:                     # SUBTRACT_GREEN
                transforms.append(("sgreen", 0, None))
            else:                            # COLOR_INDEXING
                pal_size = br.read(8) + 1
                pal_img = _decode_entropy_image(br, pal_size, 1, False)
                pal = np.cumsum(
                    pal_img.reshape(-1).view(np.uint8).reshape(-1, 4)
                    .astype(np.uint32),
                    axis=0,
                ).astype(np.uint32) & 0xFF
                # byte order of view() is little-endian: uint32 ARGB
                # → bytes [B, G, R, A]; cumsum per channel, mod 256
                palette = (
                    (pal[:, 3].astype(np.uint32) << 24)
                    | (pal[:, 2].astype(np.uint32) << 16)
                    | (pal[:, 1].astype(np.uint32) << 8)
                    | pal[:, 0].astype(np.uint32)
                )
                if pal_size <= 2:
                    wbits = 3
                elif pal_size <= 4:
                    wbits = 2
                elif pal_size <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("palette", wbits, palette))
                xsize = (xsize + (1 << wbits) - 1) >> wbits
        img = _decode_entropy_image(br, xsize, h, True)

        for kind, bits, sub in reversed(transforms):
            if kind == "sgreen":
                img = _inv_subtract_green(img)
            elif kind == "color":
                img = _inv_color_transform(
                    img, sub.astype(np.int64), bits
                )
            elif kind == "pred":
                img = _inv_predictor(img, sub.astype(np.int64), bits)
            elif kind == "palette":
                wbits = bits
                palette = sub
                if wbits:
                    per = 1 << wbits          # pixels per packed byte
                    ibits = 8 >> wbits        # bits per index
                    green = ((img >> 8) & 0xFF).astype(np.int64)
                    idx = np.zeros((h, w), dtype=np.int64)
                    for k in range(per):
                        cols = np.arange(img.shape[1]) * per + k
                        keep = cols < w
                        idx[:, cols[keep]] = (
                            green[:, keep] >> (k * ibits)
                        ) & ((1 << ibits) - 1)
                else:
                    idx = ((img >> 8) & 0xFF).astype(np.int64)
                safe = np.where(idx < len(palette), idx, 0)
                out = palette[safe]
                out = np.where(idx < len(palette), out, 0)
                img = out.astype(np.uint32)
        a = ((img >> 24) & 0xFF).astype(np.uint8)
        r = ((img >> 16) & 0xFF).astype(np.uint8)
        g = ((img >> 8) & 0xFF).astype(np.uint8)
        b = (img & 0xFF).astype(np.uint8)
        return w, h, bool(alpha_used), np.stack([r, g, b, a], axis=-1)
    except (_Corrupt, IndexError, ValueError):
        return None


def decode_webp(payload: bytes | None):
    """Container walk → first VP8L chunk → :func:`decode_vp8l`.
    Lossy (VP8) files and anything malformed → ``None``."""
    if payload is None or len(payload) < 20:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        cc = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            return None
        if cc == b"VP8L":
            return decode_vp8l(body)
        pos += 8 + sz + (sz % 2)
    return None


# ---------------------------------------------------------------------------
# encoder (fixture tier): SUBTRACT_GREEN + canonical Huffman literals
# ---------------------------------------------------------------------------


def _huffman_lengths(counts: dict[int, int]) -> dict[int, int]:
    """Code lengths from symbol counts — plain Huffman (the fixture
    alphabets are tiny, far from the 15-bit cap)."""
    import heapq
    import itertools

    if len(counts) == 1:
        return {next(iter(counts)): 1}
    tie = itertools.count()
    heap = [(n, next(tie), {s: 0}) for s, n in sorted(counts.items())]
    heapq.heapify(heap)
    while len(heap) > 1:
        n1, _, d1 = heapq.heappop(heap)
        n2, _, d2 = heapq.heappop(heap)
        merged = {s: l + 1 for s, l in d1.items()}
        merged.update({s: l + 1 for s, l in d2.items()})
        heapq.heappush(heap, (n1 + n2, next(tie), merged))
    return heap[0][2]


def _write_prefix_code(bw: BitWriter, lengths_by_symbol: dict[int, int],
                       alphabet_size: int):
    """Write one prefix code; returns symbol → (code, length) for the
    payload emission. Uses the simple form when possible, else the
    code-length-coded form with literal lengths (no repeats)."""
    syms = sorted(lengths_by_symbol)
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)                      # simple
        bw.write(0, 1)                      # one symbol
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2 and all(s < 256 for s in syms):
        bw.write(1, 1)
        bw.write(1, 1)                      # two symbols
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # full form: literal code lengths through the CL code
    lengths = [0] * alphabet_size
    for s, l in lengths_by_symbol.items():
        lengths[s] = l
    cl_counts = {}
    for l in lengths:
        cl_counts[l] = cl_counts.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_counts)
    if len(cl_lengths) == 1:
        # a lone CL symbol would be a zero-bit code on the decoder
        # side while write_code emits bits — pair it with an unused
        # dummy so the code is a real (complete) 1-bit pair
        lone = next(iter(cl_lengths))
        dummy = 15 if lone != 15 else 14
        cl_lengths = {lone: 1, dummy: 1}
    bw.write(0, 1)                          # not simple
    # transmit CL lengths over the fixed order, covering every used one
    need = max(
        i for i, s in enumerate(_CL_ORDER) if s in cl_lengths
    ) + 1
    need = max(need, 4)
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    bw.write(0, 1)                          # no max-symbol limit field
    cl_codes = canonical_codes(
        [cl_lengths.get(i, 0) for i in range(19)]
    )
    for l in lengths:                       # literal lengths, full run
        c, n = cl_codes[l]
        bw.write_code(c, n)
    codes = canonical_codes(lengths)
    return codes


def encode_webp_lossless_gray(
    rows: np.ndarray, alpha_flag: bool = False
) -> bytes:
    """Real VP8L encoding of a GRAY raster (h, w) uint8 — r=g=b=v,
    alpha 255 — via SUBTRACT_GREEN (so red/blue residuals are 0) and
    canonical-Huffman green literals; no LZ77, no cache, no meta. The
    decoder consumes this through its general code paths; constant-row
    rasters replay the GIF/PNG closed-form mean."""
    rows = np.asarray(rows, dtype=np.uint8)
    h, w = rows.shape
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    # the alpha hint bit (pixels stay opaque either way — the flag is
    # metadata; the fixture schedule pins its round trip)
    bw.write(1 if alpha_flag else 0, 1)
    bw.write(0, 3)                          # version
    bw.write(1, 1)                          # a transform follows
    bw.write(2, 2)                          # SUBTRACT_GREEN
    bw.write(0, 1)                          # no more transforms
    bw.write(0, 1)                          # no color cache
    bw.write(0, 1)                          # no meta prefix image
    counts: dict[int, int] = {}
    for v in rows.reshape(-1):
        counts[int(v)] = counts.get(int(v), 0) + 1
    green_codes = _write_prefix_code(
        bw, _huffman_lengths(counts), 256 + 24
    )
    red_codes = _write_prefix_code(bw, {0: 1}, 256)
    blue_codes = _write_prefix_code(bw, {0: 1}, 256)
    alpha_codes = _write_prefix_code(bw, {255: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)      # distance (unused)
    for v in rows.reshape(-1):
        c, n = green_codes[int(v)]
        bw.write_code(c, n)
        bw.write_code(*red_codes[0])
        bw.write_code(*blue_codes[0])
        bw.write_code(*alpha_codes[255])
    body = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# encoder, predictor tier (round 14, verdict #2): a SECOND forward
# predictor implementation, independently spelled in libwebp's
# formulation (Sub3 sign-sum Select; C truncation-toward-zero division
# in ClampAddSubtractHalf) rather than sharing the decoder's kernels —
# the GIF two-encoder precedent. A decoder inverse bug therefore
# breaks the fixture round trip (and the media_metadata webp hash)
# instead of cancelling out.
# ---------------------------------------------------------------------------


def _enc_avg2(p1: int, p2: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        out |= ((((p1 >> sh) & 0xFF) + ((p2 >> sh) & 0xFF)) >> 1) << sh
    return out


def _enc_select(l: int, t: int, tl: int) -> int:
    # Select(T, L, TL) via Sub3: Σ_ch (|L−TL| − |T−TL|); T wins ties
    s = 0
    for sh in (0, 8, 16, 24):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        s += abs(lc - tlc) - abs(tc - tlc)
    return t if s <= 0 else l


def _enc_clamp_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        v = min(255, max(0, v))
        out |= v << sh
    return out


def _enc_clamp_half(c1: int, c2: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        a = (c1 >> sh) & 0xFF
        b = (c2 >> sh) & 0xFF
        v = a + int((a - b) / 2)            # C truncation toward zero
        v = min(255, max(0, v))
        out |= v << sh
    return out


def _enc_predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _enc_avg2(_enc_avg2(l, tr), t)
    if mode == 6:
        return _enc_avg2(l, tl)
    if mode == 7:
        return _enc_avg2(l, t)
    if mode == 8:
        return _enc_avg2(tl, t)
    if mode == 9:
        return _enc_avg2(t, tr)
    if mode == 10:
        return _enc_avg2(_enc_avg2(l, tl), _enc_avg2(t, tr))
    if mode == 11:
        return _enc_select(l, t, tl)
    if mode == 12:
        return _enc_clamp_full(l, t, tl)
    if mode == 13:
        return _enc_clamp_half(_enc_avg2(l, t), tl)
    raise ValueError(f"bad predictor mode {mode}")


def _enc_forward_predict(target: np.ndarray, mode: int) -> np.ndarray:
    """Residuals such that the decoder's inverse (same edge
    conventions: (0,0) black, row 0 LEFT, column 0 TOP, last-column
    TR = leftmost pixel of the CURRENT row) reproduces ``target``."""
    h, w = target.shape
    res = np.zeros_like(target)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(target[0, x - 1])
            elif x == 0:
                pred = int(target[y - 1, 0])
            else:
                pred = _enc_predict(
                    mode,
                    int(target[y, x - 1]),
                    int(target[y - 1, x]),
                    int(target[y - 1, x - 1]),
                    int(target[y - 1, x + 1]) if x + 1 < w
                    else int(target[y, 0]),
                )
            px = int(target[y, x])
            v = 0
            for sh in (0, 8, 16, 24):
                v |= (((px >> sh) - (pred >> sh)) & 0xFF) << sh
            res[y, x] = v
    return res


def _emit_argb_payload(bw: BitWriter, flat: np.ndarray) -> None:
    """Entropy-code one ARGB image (no cache, no meta) from a flat
    uint32 array: four per-channel canonical-Huffman codes + payload."""
    a = (flat >> 24) & 0xFF
    r = (flat >> 16) & 0xFF
    g = (flat >> 8) & 0xFF
    b = flat & 0xFF
    bw.write(0, 1)                          # no color cache
    bw.write(0, 1)                          # no meta prefix image

    def lengths(vals):
        counts: dict[int, int] = {}
        for v in vals:
            counts[int(v)] = counts.get(int(v), 0) + 1
        return _huffman_lengths(counts)

    gc = _write_prefix_code(bw, lengths(g), 256 + 24)
    rc = _write_prefix_code(bw, lengths(r), 256)
    bc = _write_prefix_code(bw, lengths(b), 256)
    ac = _write_prefix_code(bw, lengths(a), 256)
    _write_prefix_code(bw, {0: 1}, 40)      # distance (unused)
    for i in range(flat.size):
        bw.write_code(*gc[int(g[i])])
        bw.write_code(*rc[int(r[i])])
        bw.write_code(*bc[int(b[i])])
        bw.write_code(*ac[int(a[i])])


def encode_webp_lossless_gray_pred(
    rows: np.ndarray, mode: int, alpha_flag: bool = False
) -> bytes:
    """VP8L encoding of a GRAY raster through the PREDICTOR transform
    (one whole-image block carrying ``mode``), residuals computed by
    the independent forward kernels above — decode exercises the
    requested inverse predictor on every interior pixel."""
    rows = np.asarray(rows, dtype=np.uint8)
    h, w = rows.shape
    gray = rows.astype(np.uint32)
    target = (
        (np.uint32(0xFF) << 24) | (gray << 16) | (gray << 8) | gray
    ).astype(np.uint32)
    res = _enc_forward_predict(target, mode)
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_flag else 0, 1)
    bw.write(0, 3)                          # version
    bw.write(1, 1)                          # a transform follows
    bw.write(0, 2)                          # PREDICTOR
    bw.write(6, 3)                          # size_bits 8 → one block
    # 1×1 predictor sub-image: mode rides the green channel
    bw.write(0, 1)                          # sub-image: no cache
    _write_prefix_code(bw, {mode: 1}, 256 + 24)
    _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    bw.write(0, 1)                          # no more transforms
    _emit_argb_payload(bw, res.reshape(-1))
    body = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
