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
    "encode_progressive_jpeg",
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


_DCT_M = None


def _dct_matrix():
    """8×8 orthonormal DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M.
    Built once per process (round 12 — rebuilding it per decode was
    ~18 % of small-fixture decode time)."""
    global _DCT_M
    if _DCT_M is None:
        import numpy as np

        m = np.zeros((8, 8), dtype=np.float64)
        for u in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            for x in range(8):
                m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
        _DCT_M = m
    return _DCT_M


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


#: (tuple(bits), tuple(vals)) → (sym_list, len_list) 2^16-entry decode
#: LUTs. Real corpora reuse a handful of tables (almost always Annex
#: K), so the cache stays tiny; capped defensively anyway because a
#: crafted corpus could ship a distinct DHT per image.
_HUFF_LUT_CACHE: dict[tuple, tuple[list[int], list[int]]] = {}
_HUFF_LUT_CACHE_MAX = 128


def _huff_lut(bits: list[int], vals: list[int]):
    """Canonical-Huffman → flat 16-bit-peek lookup tables (round 12).

    The r10 decoder walked the T.81 DECODE procedure bit-at-a-time in
    Python (~8 interpreter-dispatched calls per SYMBOL); peeking 16
    bits and indexing two plain lists decodes any symbol in O(1) with
    two list reads. Returns ``(sym, ln)`` where for every 16-bit
    window w: ``ln[w]`` is the code length (0 = invalid prefix) and
    ``sym[w]`` the decoded value. Raises on over-subscribed tables
    (code space overflow), which the caller surfaces as corrupt."""
    key = (tuple(bits), tuple(vals))
    cached = _HUFF_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    import numpy as np

    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if hi > (1 << 16) or k >= len(vals):
                raise ValueError("over-subscribed Huffman table")
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    out = (sym.tolist(), ln.tolist())
    if len(_HUFF_LUT_CACHE) >= _HUFF_LUT_CACHE_MAX:
        _HUFF_LUT_CACHE.clear()
    _HUFF_LUT_CACHE[key] = out
    return out


def _entropy_segments(np, data: bytes, pos: int):
    """Split the entropy-coded stream at ``pos`` into restart segments,
    unstuffing 0xFF00 → 0xFF with one vectorized pass (round 12 — this
    replaces the per-byte ``_BitReader`` stuffing logic).

    Returns ``(segments, end_pos)``: ``segments`` is
    ``[(u24, nbits, rst_id), ...]`` in stream order, where ``u24[k]``
    is the 24-bit big-endian window starting at byte ``k`` of the
    unstuffed segment (so the 16-bit peek at bit ``i`` is
    ``(u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF``), ``nbits`` the
    segment's exact bit length, and ``rst_id`` the 0-7 sequence number
    of the RSTn marker that TERMINATED the segment (None when the
    segment was ended by a real marker / end of data instead);
    ``end_pos`` is the absolute offset in ``data`` of the real marker
    that ended the entropy data (``len(data)`` if it just ran out) —
    the multi-scan progressive parser resumes marker parsing there.
    Reading past ``nbits`` is the truncation/marker-in-scan error the
    old reader raised lazily — the decode loop bounds-checks every
    fetch, so behavior is identical, just hoisted out of the hot
    loop."""
    arr = np.frombuffer(data, dtype=np.uint8)[pos:]
    end = len(arr)
    ff_positions = np.flatnonzero(arr == 0xFF).tolist()

    segments = []
    parts = []  # numpy slices composing the current unstuffed segment
    start = 0
    end_pos = pos + end

    def close(upto: int, rst_id):
        parts.append(arr[start:upto])
        seg = (
            parts[0].tobytes() if len(parts) == 1
            else b"".join(p.tobytes() for p in parts)
        )
        parts.clear()
        n = len(seg)
        if n <= 128:
            # Restart-heavy scans of small images produce dozens of
            # few-byte segments per image; the numpy window build's
            # fixed cost dominated them (round 16, measured in the
            # media twin's UDF profile). Same u24 values either way.
            s = seg + b"\x00\x00"
            u24 = [
                (s[k] << 16) | (s[k + 1] << 8) | s[k + 2] for k in range(n)
            ]
        else:
            b = np.frombuffer(
                seg + b"\x00\x00", dtype=np.uint8
            ).astype(np.uint32)
            u24 = ((b[:-2] << 16) | (b[1:-1] << 8) | b[2:]).tolist()
        segments.append((u24, n * 8, rst_id))

    for f in ff_positions:
        if f < start:
            continue  # already consumed as stuffing/marker bytes
        if f + 1 >= end:
            # 0xFF is the stream's last byte: reading it was always an
            # error ("truncated after 0xFF") — end the segment before it
            close(f, None)
            start = end
            end_pos = pos + f
            break
        nxt = int(arr[f + 1])
        if nxt == 0x00:  # stuffed data byte: keep the FF, drop the 00
            parts.append(arr[start : f + 1])
            start = f + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn — segment boundary
            close(f, nxt - 0xD0)
            start = f + 2
        else:  # a real marker (EOI, next SOS, …): entropy data is over
            close(f, None)
            start = end
            end_pos = pos + f
            break
    if start < end or not segments:
        close(end, None)
    return segments, end_pos


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` received bits to a signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(payload: bytes | None):
    """Full decode → ``(width, height, n_channels, pixels)`` with
    ``pixels`` a ``height × width × n_channels`` uint8 numpy array
    (RGB for 3-component JFIF, gray for 1-component), or ``None`` for
    anything invalid/unsupported (arithmetic coding, 12-bit,
    4-component, lossless, hierarchical, corrupt, truncated).

    Sequential (SOF0/SOF1) frames decode in the single-scan fast path;
    progressive (SOF2) frames — a large share of real-world web JPEGs,
    the exact corpus the F47 image dedup targets — decode via the
    multi-scan path (round 12, r11 verdict #2): spectral selection and
    successive approximation, DC first/refine and AC first/refine with
    EOB runs, restart markers in every scan kind."""
    import numpy as np

    try:
        if payload is None or len(payload) < 4 or payload[0:2] != b"\xff\xd8":
            return None
        qtables: dict[int, list[int]] = {}
        huff_dc: dict[int, tuple[list[int], list[int]]] = {}
        huff_ac: dict[int, tuple[list[int], list[int]]] = {}
        frame = None
        progressive = False
        store = None  # progressive: per-component quantized coeff blocks
        any_scan = False
        restart_interval = 0
        pos = 2
        data = payload
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xD8:
                pos += 2
                continue
            if marker == 0xD9:
                if progressive and any_scan:
                    return _reconstruct_progressive(
                        np, frame, store, qtables
                    )
                return None  # sequential: EOI before any scan
            if pos + 4 > len(data):
                return None
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
                    dec = _huff_lut(bits, vals)
                    (huff_dc if tc == 0 else huff_ac)[th] = dec
                    i += 17 + nv
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
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
                progressive = marker == 0xC2
                if progressive:
                    # same integral-sampling-ratio gate as the
                    # sequential path, checked up front here because
                    # the coefficient store is sized from the grid
                    hmax = max(c["h"] for c in comps)
                    vmax = max(c["v"] for c in comps)
                    for c in comps:
                        if (
                            c["h"] == 0 or c["v"] == 0
                            or hmax % c["h"] or vmax % c["v"]
                        ):
                            return None
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    frame["hmax"], frame["vmax"] = hmax, vmax
                    frame["mcux"], frame["mcuy"] = mcux, mcuy
                    store = [
                        [
                            [0] * 64
                            for _ in range(mcux * c["h"] * mcuy * c["v"])
                        ]
                        for c in comps
                    ]
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless/arithmetic/hierarchical unsupported
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", body, 0)[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = body[0]
                if len(body) < 4 + 2 * ns:
                    return None
                scan = []
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    idx = next(
                        (
                            j
                            for j, x in enumerate(frame["comps"])
                            if x["id"] == cs
                        ),
                        None,
                    )
                    if idx is None:
                        return None
                    scan.append((idx, tt >> 4, tt & 0x0F))
                if not progressive:
                    if len(scan) != len(frame["comps"]):
                        return None  # sequential multi-scan not supported
                    return _decode_scan(
                        np, data, pos + 2 + seglen, frame,
                        [
                            (frame["comps"][idx], d, a)
                            for idx, d, a in scan
                        ],
                        qtables, huff_dc, huff_ac, restart_interval,
                    )
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                # T.81 scan-header constraints: DC band is exactly
                # [0,0]; AC scans cover one component only; a
                # refinement pass sharpens exactly one bit.
                if ss == 0:
                    if se != 0:
                        return None
                else:
                    if not (ss <= se <= 63) or ns != 1:
                        return None
                if (ah and al != ah - 1) or al > 13:
                    return None
                pos = _decode_progressive_scan(
                    np, data, pos + 2 + seglen, frame, scan,
                    huff_dc, huff_ac, restart_interval,
                    (ss, se, ah, al), store,
                )
                any_scan = True
                continue
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
    # Per-component decode tables hoisted out of the MCU loop; the
    # Huffman tables are flat 16-bit-peek LUTs (_huff_lut) and the
    # entropy stream is pre-split/unstuffed (_entropy_segments) — the
    # round-12 vectorization of what was a bit-at-a-time Python loop
    # (measured ×3.7 on dense-entropy 512² noise, ×1.6 on smooth
    # photos, ×1.4 on the tiny twin fixtures; same bytes → same
    # pixels, pinned by the existing fuzz roundtrip + corruption
    # tests).
    per_comp = []
    for comp, dcid, acid in scan:
        dc_dec = huff_dc.get(dcid)
        ac_dec = huff_ac.get(acid)
        q = qtables.get(comp["tq"])
        if dc_dec is None or ac_dec is None or q is None:
            return None
        per_comp.append((comp["h"], comp["v"], dc_dec[0], dc_dec[1],
                         ac_dec[0], ac_dec[1], list(q)))
    segments, _ = _entropy_segments(np, data, pos)
    seg_idx = 0
    u24, nbits, seg_rst = segments[0]
    i = 0  # bit cursor within the current segment
    rst_expect = 0
    preds = [0] * len(scan)
    nmcu = mcux * mcuy
    nblocks = nmcu * sum(c["h"] * c["v"] for c, _, _ in scan)
    coeffs = np.zeros((nblocks, 64), dtype=np.float64)
    positions = []  # (ci, y0, x0) per block, in coeffs order
    nb = 0
    zz = ZIGZAG
    for mi in range(nmcu):
        if restart_interval and mi and mi % restart_interval == 0:
            # _BitReader.restart() semantics: byte-align, then the
            # RSTn marker must be RIGHT THERE with the expected
            # modulo-8 sequence number — i.e. the aligned cursor is
            # exactly this segment's end and the segment was closed
            # by RST(rst_expect).
            if ((i + 7) >> 3) << 3 != nbits or seg_rst != rst_expect:
                raise ValueError("expected restart marker (or out of sequence)")
            rst_expect = (rst_expect + 1) % 8
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated entropy data")
            u24, nbits, seg_rst = segments[seg_idx]
            i = 0
            preds = [0] * len(scan)
        my, mx = divmod(mi, mcux)
        for ci, (ch, cv, dc_sym, dc_len, ac_sym, ac_len, q) in enumerate(
            per_comp
        ):
            pred = preds[ci]
            for by in range(cv):
                for bx in range(ch):
                    row = coeffs[nb]
                    w16 = (u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF
                    length = dc_len[w16]
                    if length == 0 or i + length > nbits:
                        raise ValueError("bad DC code")
                    s = dc_sym[w16]
                    i += length
                    if s:
                        if i + s > nbits:
                            raise ValueError("truncated entropy data")
                        v = ((u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF) >> (
                            16 - s
                        )
                        i += s
                        if v < (1 << (s - 1)):
                            v += 1 - (1 << s)
                        pred += v
                    row[0] = pred * q[0]
                    k = 1
                    while k < 64:
                        w16 = (u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF
                        length = ac_len[w16]
                        if length == 0 or i + length > nbits:
                            raise ValueError("bad AC code")
                        rs = ac_sym[w16]
                        i += length
                        size = rs & 0x0F
                        if size == 0:
                            if rs == 0xF0:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            return None
                        if i + size > nbits:
                            raise ValueError("truncated entropy data")
                        v = ((u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF) >> (
                            16 - size
                        )
                        i += size
                        if v < (1 << (size - 1)):
                            v += 1 - (1 << size)
                        z = zz[k]
                        row[z] = v * q[z]
                        k += 1
                    positions.append(
                        (ci, (my * cv + by) * 8, (mx * ch + bx) * 8)
                    )
                    nb += 1
            preds[ci] = pred
    # one batched IDCT over every block in the scan (replaces the
    # per-block 8×8 matmul pair): (nb,8,8) @ broadcasted basis
    blocks = np.matmul(
        np.matmul(m.T[None, :, :], coeffs.reshape(-1, 8, 8)), m[None, :, :]
    ) + 128.0
    for n, (ci, y0, x0) in enumerate(positions):
        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blocks[n]
    comps_hv = [(comp["h"], comp["v"]) for comp, _, _ in scan]
    return _assemble(np, w, h, planes, comps_hv, hmax, vmax)


def _decode_progressive_scan(np, data, pos, frame, scan, huff_dc, huff_ac,
                             restart_interval, params, store):
    """Decode ONE progressive SOS into the per-component quantized
    coefficient ``store`` (T.81 G.2 / G.1.2): spectral selection bands,
    successive-approximation first and refinement passes, EOB runs, and
    restart markers. Returns the absolute offset of the marker that
    ended the scan's entropy data, so the caller resumes parsing there.

    ``scan`` is ``[(comp_index, dc_table_id, ac_table_id), ...]``;
    ``params`` is ``(Ss, Se, Ah, Al)``. Blocks live in the PADDED MCU
    grid (``mcux*h × mcuy*v`` per component); a single-component scan
    walks only the component's own ``ceil(cw/8) × ceil(ch/8)`` region
    (non-interleaved order, T.81 A.2.2), which is smaller whenever the
    frame's MCU grid overhangs the component."""
    ss, se, ah, al = params
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    w, h = frame["w"], frame["h"]
    segments, end_pos = _entropy_segments(np, data, pos)
    seg_idx = 0
    u24, nbits, seg_rst = segments[0]
    i = 0
    rst_expect = 0
    zz = ZIGZAG
    p1 = 1 << al
    eobrun = 0
    interleaved = len(scan) > 1

    # per-scan-component decode context:
    # (store_blocks, grid_bw, dc LUTs or None, ac LUTs or None)
    ctx = []
    for ci, dcid, acid in scan:
        comp = comps[ci]
        dc_sym = dc_len = ac_sym = ac_len = None
        if ss == 0 and ah == 0:  # DC first pass: Huffman-coded diffs
            tbl = huff_dc.get(dcid)
            if tbl is None:
                raise ValueError("missing DC table")
            dc_sym, dc_len = tbl
        if ss > 0:  # AC passes (first and refine are both Huffman-run coded)
            tbl = huff_ac.get(acid)
            if tbl is None:
                raise ValueError("missing AC table")
            ac_sym, ac_len = tbl
        # DC refinement reads one raw bit per block — no table at all.
        ctx.append(
            (store[ci], mcux * comp["h"], comp["h"], comp["v"],
             dc_sym, dc_len, ac_sym, ac_len)
        )

    # the sequence of data units: (ctx_idx, block_index) per restartable
    # unit (an MCU when interleaved, a single block otherwise)
    if interleaved:
        nunits = mcux * mcuy
        cw_blk = 0
    else:
        comp = comps[scan[0][0]]
        cw = -(-(w * comp["h"]) // hmax)  # component width in samples
        chs = -(-(h * comp["v"]) // vmax)  # component height in samples
        cw_blk = -(-cw // 8)
        ch_blk = -(-chs // 8)
        nunits = cw_blk * ch_blk
    preds = [0] * len(scan)

    def restart():
        nonlocal seg_idx, u24, nbits, seg_rst, i, rst_expect, preds, eobrun
        if ((i + 7) >> 3) << 3 != nbits or seg_rst != rst_expect:
            raise ValueError("expected restart marker (or out of sequence)")
        rst_expect = (rst_expect + 1) % 8
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError("truncated entropy data")
        u24, nbits, seg_rst = segments[seg_idx]
        i = 0
        preds = [0] * len(scan)
        eobrun = 0

    def bits(n):
        nonlocal i
        if n == 0:
            return 0
        if i + n > nbits:
            raise ValueError("truncated entropy data")
        v = ((u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF) >> (16 - n)
        i += n
        return v

    def huff(sym_lut, len_lut):
        nonlocal i
        w16 = (u24[i >> 3] >> (8 - (i & 7))) & 0xFFFF
        length = len_lut[w16]
        if length == 0 or i + length > nbits:
            raise ValueError("bad Huffman code")
        i += length
        return sym_lut[w16]

    def dc_first(block, sidx, dc_sym, dc_len):
        s = huff(dc_sym, dc_len)
        if s > 15:
            raise ValueError("bad DC category")
        diff = _extend(bits(s), s)
        preds[sidx] += diff
        block[0] = preds[sidx] << al

    def dc_refine(block):
        if bits(1):
            block[0] |= p1

    def ac_first(block, ac_sym, ac_len):
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = huff(ac_sym, ac_len)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            block[zz[k]] = _extend(bits(s), s) << al
            k += 1

    def ac_refine(block, ac_sym, ac_len):
        # T.81 G.1.2.3 correction-bit pass (same structure as the
        # public-spec reference algorithm): new coefficients arrive as
        # ±2^Al, already-nonzero coefficients absorb one magnitude bit.
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = huff(ac_sym, ac_len)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r < 15:
                        # EOB-run length INCLUDES the current block: its
                        # remaining coefficients are refined by the tail
                        # below, which also consumes its decrement —
                        # unlike the first pass, where the break alone
                        # finishes the current block
                        eobrun = 1 << r
                        if r:
                            eobrun += bits(r)
                        break
                    # r == 15 (ZRL): skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement size")
                    val = p1 if bits(1) else -p1
                while k <= se:
                    z = zz[k]
                    cur = block[z]
                    if cur != 0:
                        if bits(1) and (cur & p1) == 0:
                            block[z] = cur + (p1 if cur >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("refinement run past band end")
                    block[zz[k]] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                z = zz[k]
                cur = block[z]
                if cur != 0:
                    if bits(1) and (cur & p1) == 0:
                        block[z] = cur + (p1 if cur >= 0 else -p1)
                k += 1
            eobrun -= 1

    for unit in range(nunits):
        if restart_interval and unit and unit % restart_interval == 0:
            restart()
        if interleaved:  # DC scans only (AC scans are always ns == 1)
            my, mx = divmod(unit, mcux)
            for sidx, (blocks, bw, ch, cv, dc_sym, dc_len, _, _) in enumerate(
                ctx
            ):
                for by in range(cv):
                    for bx in range(ch):
                        block = blocks[(my * cv + by) * bw + (mx * ch + bx)]
                        if ah == 0:
                            dc_first(block, sidx, dc_sym, dc_len)
                        else:
                            dc_refine(block)
        else:
            # non-interleaved raster order over the component's own grid
            blocks, bw, ch, cv, dc_sym, dc_len, ac_sym, ac_len = ctx[0]
            by, bx = divmod(unit, cw_blk)
            block = blocks[by * bw + bx]
            if ss == 0:
                if ah == 0:
                    dc_first(block, 0, dc_sym, dc_len)
                else:
                    dc_refine(block)
            elif ah == 0:
                ac_first(block, ac_sym, ac_len)
            else:
                ac_refine(block, ac_sym, ac_len)
    return end_pos


def _reconstruct_progressive(np, frame, store, qtables):
    """Final reconstruction of a progressive frame at EOI: dequantize
    every accumulated coefficient block, one batched IDCT per
    component, assemble the padded-grid planes, then the shared
    upsample/crop/color tail (:func:`_assemble`)."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    m = _dct_matrix()
    planes = []
    for ci, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            return None
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        arr = np.asarray(store[ci], dtype=np.float64) * np.asarray(
            q, dtype=np.float64
        )
        blocks = np.matmul(
            np.matmul(m.T[None, :, :], arr.reshape(-1, 8, 8)),
            m[None, :, :],
        ) + 128.0
        planes.append(
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
    return _assemble(
        np, w, h, planes, [(c["h"], c["v"]) for c in comps],
        frame["hmax"], frame["vmax"],
    )


def _assemble(np, w, h, planes, comps_hv, hmax, vmax):
    """Upsample each component plane to the full sampling grid
    (nearest-neighbor / pixel replication, integral ratios only —
    gated by the caller), crop to the frame, and color-convert
    (JFIF YCbCr → RGB for 3 components, passthrough for gray).
    Shared by the sequential and progressive reconstruction paths."""
    out = []
    for ci, (ch, cv) in enumerate(comps_hv):
        p = planes[ci]
        ry, rx = vmax // cv, hmax // ch
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


def _prepare_components(np, arr, subsample):
    """Shared encoder front half: RGB→YCbCr (or gray passthrough),
    optional 4:2:0 / 4:2:2 chroma subsampling, and the edge-replicated
    padded MCU-grid planes. Returns ``(comps, h, w, mcux, mcuy)`` with
    each comp dict carrying its ``grid``."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

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
    return comps, h, w, mcux, mcuy


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

    comps, h, w, mcux, mcuy = _prepare_components(np, arr, subsample)
    m = _dct_matrix()
    q = [int(quant)] * 64

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


#: Flat Huffman tables for the progressive encoder: every DC category
#: at 4 bits (12 codes, Kraft 12/16), AC symbols 0-127 at 8 bits and
#: 128-255 at 9 bits (Kraft 128/256 + 128/512 = 0.75). Deliberately
#: COMPLETE over the 256 AC symbols — unlike Annex K's tables these
#: include every EOBn symbol (r<<4 | 0, r=1..14), so the encoder can
#: emit real EOB runs > 1 and the decoder's EOBRUN path is exercised
#: by round trips, not just hand-built streams. Compression is poor
#: (fixed-length codes); fixtures are tiny and that's not the point.
_PROG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_PROG_DC_VALS = list(range(12))
_PROG_AC_BITS = [0] * 7 + [128, 128] + [0] * 7
_PROG_AC_VALS = list(range(256))


def _prog_ac_put(writer, sym: int) -> None:
    if sym < 128:
        writer.put(sym, 8)
    else:
        writer.put(256 + sym - 128, 9)


def encode_progressive_jpeg(
    arr, subsample: bool = False, quant: int = 1,
    restart_interval: int = 0, spectral_split: int = 5,
) -> bytes:
    """Encode a ``H×W`` (gray) or ``H×W×3`` (RGB) uint8 array as a
    PROGRESSIVE (SOF2) JFIF JPEG — the fixture source for the decoder's
    multi-scan path (round 12). The scan script exercises BOTH
    progressive dimensions end-to-end:

    1. DC first, all components interleaved, Al=1
    2. per component: AC first, band [1, spectral_split], Al=1
    3. per component: AC first, band [spectral_split+1, 63], Al=1
    4. per component: AC refinement, band [1, 63], Ah=1 → Al=0
    5. DC refinement, all components interleaved, Ah=1 → Al=0

    Every pass ends at Al=0, so the transmitted quantized coefficients
    are IDENTICAL to what :func:`encode_baseline_jpeg` transmits for
    the same image/quant — progressive and baseline decodes of the same
    pixels must agree bit-for-bit, which is the round-trip oracle the
    tests and the ``jpeg_prog`` twin kind pin. ``restart_interval``
    applies to every scan (MCUs when interleaved, data units
    otherwise)."""
    import numpy as np

    comps, h, w, mcux, mcuy = _prepare_components(np, arr, subsample)
    if not 1 <= spectral_split <= 62:
        raise ValueError("spectral_split must be in [1, 62]")
    m = _dct_matrix()
    q = [int(quant)] * 64
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    # quantized coefficients per component, padded-grid raster order,
    # ZIGZAG order within the block (what scan encoding consumes)
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                nat = _fdct_quant(
                    np, m, c["grid"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q
                )
                blocks.append([nat[ZIGZAG[k]] for k in range(64)])
        c["zz"] = blocks
        c["bw"] = bw

    def scan_entropy(scan_comps, ss, se, ah, al):
        """Entropy-code one scan; returns (sos_body, entropy_bytes)."""
        writer = _BitWriter()
        interleaved = len(scan_comps) > 1
        preds = [0] * len(scan_comps)
        eobrun = 0
        pending = []  # buffered AC-refinement correction bits

        def flush_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                _prog_ac_put(writer, nbits << 4)
                if nbits:
                    writer.put(eobrun - (1 << nbits), nbits)
                eobrun = 0
            for bit in pending:
                writer.put(bit, 1)
            pending.clear()

        def dc_first_block(zzb, sidx):
            cur = zzb[0] >> al  # T.81: DC point transform is arithmetic shift
            diff = cur - preds[sidx]
            preds[sidx] = cur
            s = _category(diff)
            writer.put(s, 4)
            if s:
                writer.put(diff if diff > 0 else diff + (1 << s) - 1, s)

        def dc_refine_block(zzb):
            writer.put((zzb[0] >> al) & 1, 1)

        def ac_first_block(zzb):
            nonlocal eobrun
            # AC point transform truncates toward zero (T.81 G.1.2.2)
            r = 0
            wrote = False
            for k in range(ss, se + 1):
                v = zzb[k]
                t = (v >> al) if v >= 0 else -((-v) >> al)
                if t == 0:
                    r += 1
                    continue
                flush_eobrun()
                while r > 15:
                    _prog_ac_put(writer, 0xF0)
                    r -= 16
                s = _category(t)
                _prog_ac_put(writer, (r << 4) | s)
                writer.put(t if t > 0 else t + (1 << s) - 1, s)
                r = 0
                wrote = True
            if r > 0 or not wrote:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()

        def ac_refine_block(zzb):
            nonlocal eobrun
            # mirror of the decoder's G.1.2.3 pass: magnitudes shifted
            # to this precision; |t| == 1 → newly visible, |t| > 1 →
            # history coefficient contributing one correction bit
            t = [
                (abs(zzb[k]) >> al) for k in range(ss, se + 1)
            ]
            eob = 0  # index AFTER the last newly-visible coefficient
            for j, tv in enumerate(t):
                if tv == 1:
                    eob = j + 1
            r = 0
            br = []
            for j, tv in enumerate(t):
                if tv == 0:
                    r += 1
                    continue
                # fold long zero runs into ZRLs BEFORE branching on
                # history-vs-new: the decoder's ZRL walk consumes the
                # buffered correction bits of history coefficients it
                # passes, so the ZRL must be emitted at the first
                # nonzero of ANY kind once r > 15 (unless the zeros
                # can ride the block's EOB instead: j < eob)
                while r > 15 and j < eob:
                    flush_eobrun()
                    _prog_ac_put(writer, 0xF0)
                    r -= 16
                    for bit in br:
                        writer.put(bit, 1)
                    br.clear()
                if tv > 1:
                    br.append(tv & 1)
                    continue
                # newly visible (tv == 1)
                flush_eobrun()
                _prog_ac_put(writer, (r << 4) | 1)
                writer.put(1 if zzb[ss + j] > 0 else 0, 1)
                for bit in br:
                    writer.put(bit, 1)
                br.clear()
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush_eobrun()

        if interleaved:
            nunits = mcux * mcuy
        else:
            c = scan_comps[0]
            cw = -(-(w * c["h"]) // hmax)
            chs = -(-(h * c["v"]) // vmax)
            cw_blk, ch_blk = -(-cw // 8), -(-chs // 8)
            nunits = cw_blk * ch_blk
        rst = 0
        for unit in range(nunits):
            if restart_interval and unit and unit % restart_interval == 0:
                flush_eobrun()
                writer.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * len(scan_comps)
            if interleaved:
                my, mx = divmod(unit, mcux)
                for sidx, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zzb = c["zz"][
                                (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            ]
                            if ah == 0:
                                dc_first_block(zzb, sidx)
                            else:
                                dc_refine_block(zzb)
            else:
                c = scan_comps[0]
                by, bx = divmod(unit, cw_blk)
                zzb = c["zz"][by * c["bw"] + bx]
                if ss == 0:
                    dc_first_block(zzb, 0) if ah == 0 else dc_refine_block(zzb)
                elif ah == 0:
                    ac_first_block(zzb)
                else:
                    ac_refine_block(zzb)
        flush_eobrun()
        sos = bytes([len(scan_comps)])
        for c in scan_comps:
            sos += bytes([c["id"], 0x00])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        return sos, writer.flush()

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
    out += seg(0xC2, sof)
    dht = b"\x00" + bytes(_PROG_DC_BITS) + bytes(_PROG_DC_VALS)
    dht += b"\x10" + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    out += seg(0xC4, dht)

    script = [(comps, 0, 0, 0, 1)]
    for c in comps:
        script.append(([c], 1, spectral_split, 0, 1))
        script.append(([c], spectral_split + 1, 63, 0, 1))
    for c in comps:
        script.append(([c], 1, 63, 1, 0))
    script.append((comps, 0, 0, 1, 0))
    for scan_comps, ss, se, ah, al in script:
        sos, entropy = scan_entropy(scan_comps, ss, se, ah, al)
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


def synth_jpeg_blocks_prog(width: int, height: int, base: int) -> bytes:
    """The PROGRESSIVE twin of :func:`synth_jpeg_blocks`: identical
    block-constant pixels, encoded through the full SOF2 scan script
    (spectral selection + successive approximation) with restart
    markers in every scan. The decode is bit-lossless for the same
    reason the baseline one is — so the ``jpeg_prog`` media twin kind
    replays the SAME closed-form block-weighted mean, and any
    progressive-path bug (scan sequencing, EOB runs, refinement bits,
    per-scan restarts) breaks the hash."""
    import numpy as np

    yy, xx = np.mgrid[0:height, 0:width]
    px = (20 + (base + 17 * (xx // 8) + 29 * (yy // 8)) % 200).astype(np.uint8)
    return encode_progressive_jpeg(px, restart_interval=2)
