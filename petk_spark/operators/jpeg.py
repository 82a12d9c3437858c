"""Baseline-DCT JPEG codec (pure Python + numpy) — the round-10 close
of the repo's last declared codec seam (``multimodal._decode_image``'s
deterministic fake for non-PNG payloads; round-9 verdict #5).

Mold and bar are the PNG decoder's (multimodal.py): a REAL decoder over
genuine container bytes, corrupt input → ``None`` (never an exception
escaping to the task), plus a deterministic in-repo ENCODER so fixtures
need no external image library. Public-knowledge formats only: ITU-T
T.81 baseline sequential DCT, JFIF color space.

Scope (documented, like the WAV format gate):

* decode: baseline (SOF0) and extended-sequential (SOF1) Huffman JPEGs,
  1 or 3 components, any sampling factors (nearest-neighbor chroma
  upsample), restart markers, 8-bit sample precision. Progressive
  (SOF2), arithmetic coding, 12-bit precision, and CMYK → ``None`` —
  the same reporting-vs-fingerprinting bar as ``_wav_pcm_view``.
* encode (fixtures): gray 4:4:4-equivalent and color 4:4:4 / 4:2:0,
  standard Annex K Huffman tables, configurable flat quantization.
  With the default all-ones quant table a FLAT image round-trips
  bit-exactly (every AC coefficient of a constant block is exactly 0
  and the DC path is integer-exact), which is what lets the
  media_metadata oracle replay the ``jpeg`` kind closed-form.

Python-loop Huffman decoding is O(bits) interpreted — fine for the
fixture sizes the tests and twins use, and the production plumbing
around it (``mapInPandas``, bounded Arrow batches, corrupt → NULL) is
the part that must survive 100 TB; a deployment that needs bulk JPEG
throughput swaps this one module for libjpeg-turbo bindings without
touching any Spark code.
"""

from __future__ import annotations

import math
import struct

__all__ = [
    "decode_jpeg",
    "parse_jpeg",
    "encode_baseline_jpeg",
    "synth_jpeg",
    "synth_jpeg_blocks",
]

#: zigzag scan order → natural (row-major) coefficient index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K "typical" Huffman tables (public constants).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix():
    """8×8 orthonormal DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M."""
    import numpy as np

    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """val → (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical Huffman decoder: min/max code per length (the T.81
    DECODE procedure), O(length) per symbol."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.rst_expect = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # a real marker inside the scan — treat as truncation
                    raise ValueError("marker inside entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker, enforcing the
        modulo-8 sequence number (T.81 §B.2.1.2): a dropped or
        reinserted restart marker would otherwise resync at the wrong
        MCU and decode shifted pixels instead of returning None."""
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xD0 + self.rst_expect
        ):
            self.pos += 2
            self.rst_expect = (self.rst_expect + 1) % 8
        else:
            raise ValueError("expected restart marker (or out of sequence)")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` received bits to a signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(payload: bytes | None):
    """Full baseline decode → ``(width, height, n_channels, pixels)``
    with ``pixels`` a ``height × width × n_channels`` uint8 numpy array
    (RGB for 3-component JFIF, gray for 1-component), or ``None`` for
    anything invalid/unsupported (progressive, arithmetic, 12-bit,
    4-component, corrupt, truncated)."""
    import numpy as np

    try:
        if payload is None or len(payload) < 4 or payload[0:2] != b"\xff\xd8":
            return None
        qtables: dict[int, list[int]] = {}
        huff_dc: dict[int, _HuffDecoder] = {}
        huff_ac: dict[int, _HuffDecoder] = {}
        frame = None
        restart_interval = 0
        pos = 2
        data = payload
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xD8:
                pos += 2
                continue
            if marker == 0xD9:
                return None  # EOI before any scan
            seglen = struct.unpack_from(">H", data, pos + 2)[0]
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                return None
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    i += 1
                    n = 64 * (2 if pq == 1 else 1)
                    raw = body[i : i + n]
                    if len(raw) != n:
                        return None
                    if pq == 1:
                        vals = list(struct.unpack(f">{64}H", raw))
                    else:
                        vals = list(raw)
                    tbl = [0] * 64
                    for k in range(64):
                        tbl[ZIGZAG[k]] = vals[k]
                    qtables[tq] = tbl
                    i += n
            elif marker == 0xC4:  # DHT
                i = 0
                while i + 17 <= len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    bits = list(body[i + 1 : i + 17])
                    nv = sum(bits)
                    vals = list(body[i + 17 : i + 17 + nv])
                    if len(vals) != nv:
                        return None
                    dec = _HuffDecoder(bits, vals)
                    (huff_dc if tc == 0 else huff_ac)[th] = dec
                    i += 17 + nv
            elif marker in (0xC0, 0xC1):  # SOF0/1 baseline/ext-sequential
                prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                    )
                frame = {"w": w, "h": h, "comps": comps}
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/lossless/arithmetic unsupported
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", body, 0)[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = body[0]
                scan = []
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    comp = next(
                        (x for x in frame["comps"] if x["id"] == cs), None
                    )
                    if comp is None:
                        return None
                    scan.append((comp, tt >> 4, tt & 0x0F))
                if len(scan) != len(frame["comps"]):
                    return None  # multi-scan not supported
                return _decode_scan(
                    np, data, pos + 2 + seglen, frame, scan,
                    qtables, huff_dc, huff_ac, restart_interval,
                )
            pos += 2 + seglen
        return None
    except Exception:
        return None


def _decode_scan(np, data, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    # non-integral sampling ratios (e.g. 3:2) would need fractional
    # upsampling the repeat() below cannot express — without this gate
    # the chroma plane is silently left un-upsampled and, when the crop
    # happens to fit, the decoder returns WRONG COLORS instead of None.
    # libjpeg likewise supports only integral ratios.
    for c in comps:
        if c["h"] == 0 or c["v"] == 0 or hmax % c["h"] or vmax % c["v"]:
            return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    m = _dct_matrix()
    planes = []
    for comp, _, _ in scan:
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    nmcu = mcux * mcuy
    for mi in range(nmcu):
        if restart_interval and mi and mi % restart_interval == 0:
            reader.restart()
            preds = [0] * len(scan)
        my, mx = divmod(mi, mcux)
        for ci, (comp, dcid, acid) in enumerate(scan):
            dc_dec = huff_dc.get(dcid)
            ac_dec = huff_ac.get(acid)
            q = qtables.get(comp["tq"])
            if dc_dec is None or ac_dec is None or q is None:
                return None
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coeff = np.zeros(64, dtype=np.float64)
                    s = dc_dec.decode(reader)
                    diff = _extend(reader.receive(s), s)
                    preds[ci] += diff
                    coeff[0] = preds[ci] * q[0]
                    k = 1
                    while k < 64:
                        rs = ac_dec.decode(reader)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            return None
                        coeff[ZIGZAG[k]] = (
                            _extend(reader.receive(size), size) * q[ZIGZAG[k]]
                        )
                        k += 1
                    block = m.T @ coeff.reshape(8, 8) @ m + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full grid, crop, color-convert
    out = []
    for ci, (comp, _, _) in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        gray = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return (w, h, 1, gray[:, :, None])
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return (w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8))


def parse_jpeg(payload: bytes | None):
    """(valid, width, height, n_channels, bit_depth, mean_luma) by full
    decode — the JPEG twin of ``multimodal.parse_png`` (mean over ALL
    samples of the decoded image, 8-bit always). Invalid/unsupported →
    ``(False, None, None, None, None, None)``."""
    dec = decode_jpeg(payload)
    if dec is None:
        return (False, None, None, None, None, None)
    w, h, nc, px = dec
    return (True, w, h, nc, 8, float(px.mean()))


# ---------------------------------------------------------------------------
# Encoder (fixtures)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def marker(self, m: int) -> None:
        """Byte-align (1-pad) and emit a bare marker (RSTn)."""
        while self.nbits:
            self.put(1, 1)
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        while self.nbits:
            self.put(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(writer, coeff, pred, dc_codes, ac_codes):
    """coeff: 64 ints in NATURAL order; returns new DC predictor."""
    dc = coeff[0]
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.put(code, ln)
    if s:
        writer.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    zz = [coeff[ZIGZAG[k]] for k in range(64)]
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.put(code, ln)
        writer.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        writer.put(code, ln)
    return dc


def _fdct_quant(np, m, tile, q):
    f = m @ (tile - 128.0) @ m.T
    return [int(x) for x in np.rint(f.flatten() / np.array(q, dtype=np.float64)).astype(np.int64)]


def _plane_blocks(np, plane, bw, bh):
    """Pad a component plane to (bh*8, bw*8) by edge replication."""
    ph, pw = plane.shape
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    out[:ph, :pw] = plane
    if bw * 8 > pw:
        out[:ph, pw:] = plane[:, -1:]
    if bh * 8 > ph:
        out[ph:, :] = out[ph - 1 : ph, :]
    return out


def encode_baseline_jpeg(
    arr, subsample: bool = False, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode a ``H×W`` (gray) or ``H×W×3`` (RGB) uint8 array as a
    baseline JFIF JPEG with Annex K Huffman tables and a flat
    ``quant``-valued quantization table (default 1 — near-lossless,
    and EXACTLY lossless for flat images: a constant block's AC
    coefficients are identically 0 and its DC is integer before
    rounding). ``subsample`` (color only): ``True``/``"420"`` writes
    4:2:0 with 2×2-mean chroma; ``"422"`` writes 4:2:2 (horizontal
    halving only — the asymmetric-sampling case the decoder's
    per-axis upsample must handle). ``restart_interval > 0`` writes a
    DRI segment and RSTn markers every that-many MCUs (exercises the
    decoder's restart path; real-world camera JPEGs use it
    routinely)."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    m = _dct_matrix()
    q = [int(quant)] * 64

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": arr}]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.rint(x), 0, 255) for x in (y, cb, cr))
        mode = {True: "420", False: None}.get(subsample, subsample)
        if mode == "420":
            # pad to even dims by edge replication, then 2×2 mean
            def half(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return np.rint(
                    (ph[0::2, 0::2] + ph[0::2, 1::2]
                     + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0
                )
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": y},
                {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": half(cb)},
                {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": half(cr)},
            ]
        elif mode == "422":
            def halfh(p):
                ph = np.pad(p, ((0, 0), (0, p.shape[1] % 2)), mode="edge")
                return np.rint((ph[:, 0::2] + ph[:, 1::2]) / 2.0)
            comps = [
                {"id": 1, "h": 2, "v": 1, "tq": 0, "plane": y},
                {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": halfh(cb)},
                {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": halfh(cr)},
            ]
        elif mode is None:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y},
                {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": cr},
            ]
        else:
            raise ValueError(f"subsample must be bool/'420'/'422', got {subsample!r}")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["grid"] = _plane_blocks(np, c["plane"], mcux * c["h"], mcuy * c["v"])

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            writer.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            preds = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            dc_codes, ac_codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    tile = c["grid"][y0 : y0 + 8, x0 : x0 + 8]
                    coeff = _fdct_quant(np, m, tile, q)
                    preds[ci] = _encode_block(
                        writer, coeff, preds[ci], dc_codes, ac_codes
                    )
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = bytes(q[ZIGZAG[k]] for k in range(64))
    out += seg(0xDB, b"\x00" + zz_q)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])
    out += seg(0xC0, sof)
    dht = b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht += b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    if len(comps) > 1:
        dht += b"\x01" + bytes(_DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS)
        dht += b"\x11" + bytes(_AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS)
    out += seg(0xC4, dht)
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        tt = 0x00 if ci == 0 else 0x11
        sos += bytes([c["id"], tt])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def synth_jpeg(
    width: int, height: int, base: int, gray: bool = True,
    subsample: bool = False, flat: bool = False,
) -> bytes:
    """Deterministic JPEG fixture (the ``synth_png`` analog).
    ``flat=True`` writes a constant-``base`` image — bit-exact through
    the default quant-1 round trip, which is what the closed-form
    oracle kind relies on; otherwise a smooth additive gradient."""
    import numpy as np

    if flat:
        px = np.full((height, width), base % 256, dtype=np.uint8)
    else:
        yy, xx = np.mgrid[0:height, 0:width]
        px = ((base + xx + yy) % 256).astype(np.uint8)
    if not gray:
        px = np.stack([px, np.roll(px, 1, axis=1), 255 - px], axis=2)
        if flat:
            px = np.stack(
                [np.full((height, width), base % 256, dtype=np.uint8)] * 3,
                axis=2,
            )
    return encode_baseline_jpeg(px, subsample=subsample)


def synth_jpeg_blocks(width: int, height: int, base: int) -> bytes:
    """Gray JPEG whose pixel at (r, c) is EXACTLY
    ``20 + (base + 17·(c//8) + 29·(r//8)) % 200`` — constant per 8×8
    block, different across blocks. Every block's AC coefficients are
    identically zero and its DC is integer-exact, so the quant-1 round
    trip is bit-lossless while still exercising the DC-prediction
    chain across both MCU axes and the edge-replication padding of
    partial boundary blocks. The image mean is a closed-form function
    of (width, height, base) — integer block sums weighted by the
    pixels-per-block counts ``min(8, w − 8·bx) × min(8, h − 8·by)`` —
    which is what the media_metadata ``jpeg`` oracle kind replays in
    SQL."""
    import numpy as np

    yy, xx = np.mgrid[0:height, 0:width]
    px = (20 + (base + 17 * (xx // 8) + 29 * (yy // 8)) % 200).astype(np.uint8)
    return encode_baseline_jpeg(px)
