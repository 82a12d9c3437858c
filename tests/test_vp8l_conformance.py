"""VP8L conformance hardening (round 14, verdict #2 + ADVICE high).

Three independent cross-checks against the repo decoder:

* the 120-entry 2D distance map is compared against an independently
  transcribed copy of libwebp's ``plane_to_code_lut`` encoder table
  (public, RFC 9649 / libwebp ``src/dsp/lossless_enc.c``) — the two
  tables are derived in opposite directions, so a transcription slip
  in either one fails the comparison;
* the Select / ClampAddSubtractHalf kernels are compared against
  independent spellings that follow libwebp's formulation
  (``Sub3``-sum sign test; C truncation-toward-zero division) over
  randomized inputs including engineered exact ties;
* every one of the 14 predictor modes and the mapped (non-verbatim)
  LZ77 distance codes round-trip through hand-emitted bitstreams whose
  expected pixels are computed by an independent forward transform in
  this file, never by the decoder itself.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.vp8l import (
    BitWriter,
    _DIST_MAP,
    _clamp_add_sub_half,
    _huffman_lengths,
    _select,
    _write_prefix_code,
    decode_vp8l,
)

# ---------------------------------------------------------------------------
# independent distance table, derived closed-form from the spec's
# ordering rule rather than transcribed: the 120 short-distance codes
# enumerate the window x ∈ [-7, 8], y ∈ [0, 7] (excluding the
# non-causal y == 0, x <= 0 half-row) sorted by squared euclidean
# distance, ties broken by |x| ascending then positive x first —
# verified to reproduce libwebp's plane_to_code_lut exactly.
# ---------------------------------------------------------------------------


def _lut_code_to_offset() -> dict[int, tuple[int, int]]:
    window = [
        (x, y)
        for x in range(-7, 9)
        for y in range(0, 8)
        if y > 0 or x > 0
    ]
    window.sort(
        key=lambda p: (
            p[0] * p[0] + p[1] * p[1],
            abs(p[0]),
            0 if p[0] >= 0 else 1,
        )
    )
    assert len(window) == 120
    return {i + 1: xy for i, xy in enumerate(window)}


def test_dist_map_matches_plane_to_code_lut():
    inv = _lut_code_to_offset()
    assert len(_DIST_MAP) == 120
    assert len(inv) == 120
    assert len(set(_DIST_MAP)) == 120
    for code in range(1, 121):
        x, y = _DIST_MAP[code - 1]
        assert -7 <= x <= 8 and 0 <= y <= 7 and (y > 0 or x > 0), code
        assert (x, y) == inv[code], (
            f"dist code {code}: repo {( x, y)} vs libwebp {inv[code]}"
        )


# ---------------------------------------------------------------------------
# kernel cross-checks: independent libwebp-style spellings
# ---------------------------------------------------------------------------


def _select_libwebp(l: int, t: int, tl: int) -> int:
    # Select(T, L, TL): Σ_ch (|L-TL| - |T-TL|); return T when <= 0
    s = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        s += abs(lc - tlc) - abs(tc - tlc)
    return t if s <= 0 else l


def _clamp_half_libwebp(c1: int, c2: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (c1 >> sh) & 0xFF
        b = (c2 >> sh) & 0xFF
        v = a + int((a - b) / 2)          # C truncation toward zero
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _rand_argb(rng: np.random.RandomState) -> int:
    return int(rng.randint(0, 2**32, dtype=np.uint64))


def test_select_matches_libwebp_including_ties():
    rng = np.random.RandomState(11)
    for _ in range(3000):
        l, t, tl = (_rand_argb(rng) for _ in range(3))
        assert _select(l, t, tl) == _select_libwebp(l, t, tl)
    # engineered exact tie: L and T symmetric around TL → pL == pT,
    # spec returns TOP
    tl = 0x80808080
    l = 0x82808080
    t = 0x7E808080
    assert _select(l, t, tl) == t
    # and when every channel matches, the answer is TOP too
    assert _select(0x01020304, 0x01020304, 0x0) == 0x01020304


def test_clamp_half_matches_c_truncation():
    rng = np.random.RandomState(12)
    for _ in range(3000):
        c1, c2 = _rand_argb(rng), _rand_argb(rng)
        assert _clamp_add_sub_half(c1, c2) == _clamp_half_libwebp(c1, c2)
    # the floor-division trap: ave 10, other 13 → C gives 9, floor 8
    assert _clamp_add_sub_half(10, 13) == 9


# ---------------------------------------------------------------------------
# bitstream emission helpers (test-local)
# ---------------------------------------------------------------------------


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _wrap_chunk(bw: BitWriter) -> bytes:
    return b"\x2f" + bw.getvalue()


def _channel_codes(bw: BitWriter, values, alphabet: int):
    counts: dict[int, int] = {}
    for v in values:
        counts[int(v)] = counts.get(int(v), 0) + 1
    return _write_prefix_code(bw, _huffman_lengths(counts), alphabet)


def _prefix_code_for_value(value: int) -> tuple[int, int, int]:
    """Inverse of the decoder's length/distance ``_prefix_value``:
    → (prefix_code, n_extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return code, extra, value - offset - 1
    raise AssertionError(f"no prefix code for {value}")


def _emit_argb_literals(w: int, h: int, argb: np.ndarray) -> bytes:
    """Whole image as ARGB literals, no transforms."""
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)              # no transforms
    bw.write(0, 1)              # no cache
    bw.write(0, 1)              # no meta
    flat = argb.reshape(-1)
    a = (flat >> 24) & 0xFF
    r = (flat >> 16) & 0xFF
    g = (flat >> 8) & 0xFF
    b = flat & 0xFF
    gc = _channel_codes(bw, g, 256 + 24)
    rc = _channel_codes(bw, r, 256)
    bc = _channel_codes(bw, b, 256)
    ac = _channel_codes(bw, a, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    for i in range(flat.size):
        bw.write_code(*gc[int(g[i])])
        bw.write_code(*rc[int(r[i])])
        bw.write_code(*bc[int(b[i])])
        bw.write_code(*ac[int(a[i])])
    return _wrap_chunk(bw)


# ---------------------------------------------------------------------------
# independent forward predictor transform → full 14-mode sweep
# ---------------------------------------------------------------------------


def _avg2_ref(p1: int, p2: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p1 >> sh) & 0xFF) + ((p2 >> sh) & 0xFF)) >> 1) << sh
    return out


def _clamp_full_ref(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _predict_ref(mode: int, l: int, t: int, tl: int, tr: int) -> int:
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
        return _avg2_ref(_avg2_ref(l, tr), t)
    if mode == 6:
        return _avg2_ref(l, tl)
    if mode == 7:
        return _avg2_ref(l, t)
    if mode == 8:
        return _avg2_ref(tl, t)
    if mode == 9:
        return _avg2_ref(t, tr)
    if mode == 10:
        return _avg2_ref(_avg2_ref(l, tl), _avg2_ref(t, tr))
    if mode == 11:
        return _select_libwebp(l, t, tl)
    if mode == 12:
        return _clamp_full_ref(l, t, tl)
    if mode == 13:
        return _clamp_half_libwebp(_avg2_ref(l, t), tl)
    raise AssertionError(mode)


def _forward_predict(target: np.ndarray, mode: int) -> np.ndarray:
    """Residual image such that the decoder's inverse reproduces
    ``target`` — predictions computed by the INDEPENDENT kernels."""
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
                l = int(target[y, x - 1])
                t = int(target[y - 1, x])
                tl = int(target[y - 1, x - 1])
                tr = int(target[y - 1, x + 1]) if x + 1 < w else int(
                    target[y, 0]   # spec: rightmost-column TR = current row's leftmost
                )
                pred = _predict_ref(mode, l, t, tl, tr)
            px = int(target[y, x])
            out = 0
            for sh in (24, 16, 8, 0):
                out |= (((px >> sh) - (pred >> sh)) & 0xFF) << sh
            res[y, x] = out
    return res


def _emit_predictor_image(
    w: int, h: int, mode: int, residual: np.ndarray
) -> bytes:
    """Predictor transform (size_bits 8 → one block, sub-image 1×1
    carrying ``mode`` in green) + residual ARGB literals."""
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)              # a transform
    bw.write(0, 2)              # PREDICTOR
    bw.write(6, 3)              # size_bits = 8
    bw.write(0, 1)              # sub-image: no cache
    _write_prefix_code(bw, {mode: 1}, 256 + 24)
    _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    bw.write(0, 1)              # no more transforms
    bw.write(0, 1)              # no cache
    bw.write(0, 1)              # no meta
    flat = residual.reshape(-1)
    a = (flat >> 24) & 0xFF
    r = (flat >> 16) & 0xFF
    g = (flat >> 8) & 0xFF
    b = flat & 0xFF
    gc = _channel_codes(bw, g, 256 + 24)
    rc = _channel_codes(bw, r, 256)
    bc = _channel_codes(bw, b, 256)
    ac = _channel_codes(bw, a, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    for i in range(flat.size):
        bw.write_code(*gc[int(g[i])])
        bw.write_code(*rc[int(r[i])])
        bw.write_code(*bc[int(b[i])])
        bw.write_code(*ac[int(a[i])])
    return _wrap_chunk(bw)


def _rand_target(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    rgb = rng.randint(0, 2**24, (h, w), dtype=np.uint64)
    return (0xFF000000 | rgb).astype(np.uint32)


def test_predictor_mode_sweep_all_14():
    rng = np.random.RandomState(77)
    for mode in range(14):
        target = _rand_target(rng, 5, 9)
        res = _forward_predict(target, mode)
        dec = decode_vp8l(_emit_predictor_image(9, 5, mode, res))
        assert dec is not None, f"mode {mode} failed to decode"
        _w, _h, _alpha, px = dec
        got = (
            (px[:, :, 3].astype(np.uint32) << 24)
            | (px[:, :, 0].astype(np.uint32) << 16)
            | (px[:, :, 1].astype(np.uint32) << 8)
            | px[:, :, 2].astype(np.uint32)
        )
        assert np.array_equal(got, target), f"mode {mode} wrong pixels"


def test_predictor_sweep_edge_stress():
    """Ties and saturations on purpose: low-entropy targets hit the
    avg/select/clamp corner cases more often than uniform noise."""
    rng = np.random.RandomState(99)
    palette = np.array(
        [0xFF000000, 0xFF010101, 0xFFFFFFFF, 0xFF808080, 0xFF7F8081],
        dtype=np.uint32,
    )
    for mode in (5, 10, 11, 12, 13):
        for trial in range(4):
            idx = rng.randint(0, len(palette), (6, 7))
            target = palette[idx]
            res = _forward_predict(target, mode)
            dec = decode_vp8l(_emit_predictor_image(7, 6, mode, res))
            assert dec is not None, (mode, trial)
            got = (
                (dec[3][:, :, 3].astype(np.uint32) << 24)
                | (dec[3][:, :, 0].astype(np.uint32) << 16)
                | (dec[3][:, :, 1].astype(np.uint32) << 8)
                | dec[3][:, :, 2].astype(np.uint32)
            )
            assert np.array_equal(got, target), (mode, trial)


# ---------------------------------------------------------------------------
# mapped LZ77 distance codes through real bitstreams
# ---------------------------------------------------------------------------


def _emit_with_backref(
    w: int, h: int, prefix_px: np.ndarray, dist_code: int, length: int
) -> bytes:
    """``prefix_px`` literals, one backref (mapped ``dist_code``,
    ``length``), then literals of 0xFF000000 to fill the image."""
    total = w * h
    n_prefix = prefix_px.size
    n_tail = total - n_prefix - length
    assert n_tail >= 0
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    lcode, lextra, lextra_v = _prefix_code_for_value(length)
    dcode, dextra, dextra_v = _prefix_code_for_value(dist_code)
    flat = prefix_px.reshape(-1)
    tail = np.full(n_tail, 0xFF000000, dtype=np.uint32)
    lits = np.concatenate([flat, tail])
    a = (lits >> 24) & 0xFF
    r = (lits >> 16) & 0xFF
    g = (lits >> 8) & 0xFF
    b = lits & 0xFF
    g_syms = {int(v): 0 for v in g}
    counts = {s: int((g == s).sum()) for s in g_syms}
    counts[256 + lcode] = 1
    gc = _write_prefix_code(bw, _huffman_lengths(counts), 256 + 24)
    rc = _channel_codes(bw, r, 256)
    bc = _channel_codes(bw, b, 256)
    ac = _channel_codes(bw, a, 256)
    dc = _write_prefix_code(bw, {dcode: 1}, 40)

    def lit(i):
        bw.write_code(*gc[int(g[i])])
        bw.write_code(*rc[int(r[i])])
        bw.write_code(*bc[int(b[i])])
        bw.write_code(*ac[int(a[i])])

    for i in range(n_prefix):
        lit(i)
    bw.write_code(*gc[256 + lcode])
    if lextra:
        bw.write(lextra_v, lextra)
    bw.write_code(*dc[dcode])
    if dextra:
        bw.write(dextra_v, dextra)
    for i in range(n_prefix, n_prefix + n_tail):
        lit(i)
    return _wrap_chunk(bw)


def test_mapped_distance_codes_bitstream():
    """Backrefs through the decoder at a spread of mapped distance
    codes — expected pixels computed with the INDEPENDENT lut."""
    inv = _lut_code_to_offset()
    rng = np.random.RandomState(5)
    w, h = 18, 8
    for dist_code in (1, 2, 9, 50, 97, 103, 105, 106, 109, 111, 114,
                      116, 117, 119, 120):
        x, y = inv[dist_code]
        dist = y * w + x
        n_prefix = max(dist + 2, 20)
        length = 4
        assert n_prefix + length <= w * h
        prefix = (0xFF000000 | rng.randint(
            0, 2**24, n_prefix, dtype=np.uint64
        )).astype(np.uint32)
        chunk = _emit_with_backref(w, h, prefix, dist_code, length)
        dec = decode_vp8l(chunk)
        assert dec is not None, dist_code
        got = (
            (dec[3][:, :, 3].astype(np.uint32) << 24)
            | (dec[3][:, :, 0].astype(np.uint32) << 16)
            | (dec[3][:, :, 1].astype(np.uint32) << 8)
            | dec[3][:, :, 2].astype(np.uint32)
        ).reshape(-1)
        # independent expectation: LZ77 copy semantics
        expect = list(prefix)
        for _ in range(length):
            expect.append(expect[len(expect) - dist])
        assert got[: len(expect)].tolist() == [
            int(v) for v in expect
        ], f"dist code {dist_code} (offset {x},{y}, dist {dist})"


def test_literal_only_emission_helper_round_trips():
    rng = np.random.RandomState(21)
    target = _rand_target(rng, 4, 6)
    dec = decode_vp8l(_emit_argb_literals(6, 4, target))
    assert dec is not None
    got = (
        (dec[3][:, :, 3].astype(np.uint32) << 24)
        | (dec[3][:, :, 0].astype(np.uint32) << 16)
        | (dec[3][:, :, 1].astype(np.uint32) << 8)
        | dec[3][:, :, 2].astype(np.uint32)
    )
    assert np.array_equal(got, target)


# ---------------------------------------------------------------------------
# rightmost-column TR convention (round 15, ADVICE medium): the spec's
# "Predictor Transform" section says the TR-pixel of a rightmost-column
# pixel is the LEFTMOST pixel of the CURRENT row (already decoded), not
# the row above's. A shared forward/inverse pair can never catch a
# convention slip, so this fixture pins the inverse alone: residuals
# are hand-written, the expected pixels are hand arithmetic, and the
# image is built so current-row[0] differs from row-above[0] — the two
# conventions decode the bottom-right pixel to different values.
# ---------------------------------------------------------------------------


def test_rightmost_column_tr_is_current_row_leftmost():
    # 2x2, mode 3 (pred = TR) over the whole image:
    #   (0,0) pred=black, (0,1) pred=LEFT, (1,0) pred=TOP,
    #   (1,1) rightmost -> pred = out[1,0] per spec (0xFF212223),
    #   NOT out[0,0] (0xFF010203 under the old row-above convention).
    res = np.array(
        [[0x00010203, 0x00101010],
         [0x00202020, 0x00000000]],
        dtype=np.uint32,
    )
    expected = np.array(
        [[0xFF010203, 0xFF111213],
         [0xFF212223, 0xFF212223]],
        dtype=np.uint32,
    )
    wrong_convention_px = 0xFF010203      # what row-above TR would give
    assert expected[1, 1] != wrong_convention_px
    dec = decode_vp8l(_emit_predictor_image(2, 2, 3, res))
    assert dec is not None
    got = (
        (dec[3][:, :, 3].astype(np.uint32) << 24)
        | (dec[3][:, :, 0].astype(np.uint32) << 16)
        | (dec[3][:, :, 1].astype(np.uint32) << 8)
        | dec[3][:, :, 2].astype(np.uint32)
    )
    assert np.array_equal(got, expected), got
    assert got[1, 1] != wrong_convention_px


def test_rightmost_column_tr_round_trip_all_tr_modes():
    """Round-trip through the repo forward kernels for every TR-using
    mode with a target whose column-0 values differ between adjacent
    rows — exercises the corrected fallback on both sides."""
    rng = np.random.RandomState(1515)
    for mode in (3, 5, 9, 10, 13):
        target = _rand_target(rng, 6, 5)
        # force column 0 to differ row-to-row
        target[:, 0] = 0xFF000000 | np.arange(17, 17 + 6 * 40, 40, dtype=np.uint32)
        from petk_spark.operators.vp8l import _enc_forward_predict

        res = _enc_forward_predict(target, mode)
        dec = decode_vp8l(_emit_predictor_image(5, 6, mode, res))
        assert dec is not None, mode
        got = (
            (dec[3][:, :, 3].astype(np.uint32) << 24)
            | (dec[3][:, :, 0].astype(np.uint32) << 16)
            | (dec[3][:, :, 1].astype(np.uint32) << 8)
            | dec[3][:, :, 2].astype(np.uint32)
        )
        assert np.array_equal(got, target), mode
