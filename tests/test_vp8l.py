"""VP8L lossless-WebP codec (operators/vp8l.py, round 13): encoder→
decoder round trips through the general prefix-code paths, hand-built
bitstreams for the decoder-only features (LZ77 backrefs, color cache,
color-indexing palette, meta prefix image, predictor/color
transforms), and the corrupt contract. The media_metadata ``webp``
kind's lossless rows hash-pin the closed-form mean replay."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.vp8l import (
    BitWriter,
    _write_prefix_code,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless_gray,
)


def _wrap(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)              # alpha unused
    bw.write(0, 3)              # version


def test_round_trip_shapes():
    for h, w, base in [(24, 37, 100), (1, 1, 7), (16, 48, 199),
                       (39, 16, 0)]:
        rows = np.tile(
            ((base + np.arange(h)) % 256).astype(np.uint8)[:, None],
            (1, w),
        )
        dec = decode_webp(encode_webp_lossless_gray(rows))
        assert dec is not None, (h, w, base)
        dw, dh, _alpha, px = dec
        assert (dw, dh) == (w, h)
        for c in range(3):
            assert np.array_equal(px[:, :, c], rows)
        assert (px[:, :, 3] == 255).all()


def test_round_trip_random_gray():
    rng = np.random.RandomState(7)
    rows = rng.randint(0, 256, (31, 23)).astype(np.uint8)
    dec = decode_webp(encode_webp_lossless_gray(rows))
    assert dec and np.array_equal(dec[3][:, :, 1], rows)


def test_lz77_verbatim_distance():
    """green symbol 256 (length code 0 → length 1+extra) copying at a
    verbatim distance (code 121 → distance 1): 'ab' then 6 copies of
    a backref reproduces a run."""
    w, h = 8, 1
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)              # no transforms
    bw.write(0, 1)              # no cache
    bw.write(0, 1)              # no meta
    # green alphabet: literals 10, 20 and length-prefix symbol 256+2
    # (prefix code 2 → value 3, no extra bits)
    g = _write_prefix_code(bw, {10: 2, 20: 2, 256 + 2: 1}, 256 + 24)
    r = _write_prefix_code(bw, {0: 1}, 256)
    b = _write_prefix_code(bw, {0: 1}, 256)
    a = _write_prefix_code(bw, {255: 1}, 256)
    # distance code: prefix symbol 13 → offset 96, 5 extra bits; with
    # extra=24 the value is 121 → verbatim distance 1
    d = _write_prefix_code(bw, {13: 1}, 40)

    def lit(v):
        bw.write_code(*g[v])
        bw.write_code(*r[0])
        bw.write_code(*b[0])
        bw.write_code(*a[255])

    lit(10)
    lit(20)
    # backref: length 3 (code 2, no extra), distance 1
    bw.write_code(*g[256 + 2])
    bw.write_code(*d[13])
    bw.write(24, 5)
    # 3 more literals to fill 8 px
    lit(10)
    lit(20)
    lit(10)
    dec = decode_vp8l(b"\x2f" + bw.getvalue())
    assert dec is not None
    green = dec[3][:, :, 1].reshape(-1).tolist()
    assert green == [10, 20, 20, 20, 20, 10, 20, 10]


def test_color_cache_hit():
    w, h = 4, 1
    px_argb = (255 << 24) | (0 << 16) | (42 << 8) | 0
    cache_bits = 4
    idx = ((px_argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)              # no transforms
    bw.write(1, 1)              # cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)              # no meta
    cache_size = 1 << cache_bits
    g = _write_prefix_code(
        bw, {42: 1, 256 + 24 + idx: 1}, 256 + 24 + cache_size
    )
    r = _write_prefix_code(bw, {0: 1}, 256)
    b = _write_prefix_code(bw, {0: 1}, 256)
    a = _write_prefix_code(bw, {255: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    bw.write_code(*g[42])       # literal → inserted into cache
    bw.write_code(*r[0])
    bw.write_code(*b[0])
    bw.write_code(*a[255])
    for _ in range(3):          # three cache hits
        bw.write_code(*g[256 + 24 + idx])
    dec = decode_vp8l(b"\x2f" + bw.getvalue())
    assert dec is not None
    assert dec[3][:, :, 1].reshape(-1).tolist() == [42, 42, 42, 42]
    assert dec[3][:, :, 3].reshape(-1).tolist() == [255] * 4


def test_color_indexing_palette():
    """3-entry palette (wbits=2 → 4 indices per packed green byte),
    delta-coded entries, over an 8×1 image."""
    w, h = 8, 1
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)              # a transform
    bw.write(3, 2)              # COLOR_INDEXING
    bw.write(3 - 1, 8)          # palette size 3
    # palette entropy image: width 3, height 1; entries delta-coded.
    # target colors (a,r,g,b): (255,10,10,10), (255,40,40,40),
    # (255,90,90,90) → deltas (255,10,10,10), (0,30,30,30), (0,50,50,50)
    bw.write(0, 1)              # no cache (palette image)
    pg = _write_prefix_code(bw, {10: 1, 30: 2, 50: 2}, 256 + 24)
    pr = _write_prefix_code(bw, {10: 1, 30: 2, 50: 2}, 256)
    pb = _write_prefix_code(bw, {10: 1, 30: 2, 50: 2}, 256)
    pa = _write_prefix_code(bw, {255: 1, 0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    for gv, av in [(10, 255), (30, 0), (50, 0)]:
        bw.write_code(*pg[gv])
        bw.write_code(*pr[gv])
        bw.write_code(*pb[gv])
        bw.write_code(*pa[av])
    bw.write(0, 1)              # no more transforms
    # main image at reduced width ceil(8/4)=2: packed indices in green.
    # pixels: 0 1 2 0 | 1 1 2 0 → bytes (2-bit LSB-first):
    byte0 = 0 | (1 << 2) | (2 << 4) | (0 << 6)
    byte1 = 1 | (1 << 2) | (2 << 4) | (0 << 6)
    bw.write(0, 1)              # no cache (main image)
    bw.write(0, 1)              # no meta
    mg = _write_prefix_code(bw, {byte0: 1, byte1: 1}, 256 + 24)
    mr = _write_prefix_code(bw, {0: 1}, 256)
    mb = _write_prefix_code(bw, {0: 1}, 256)
    ma = _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    for v in (byte0, byte1):
        bw.write_code(*mg[v])
        bw.write_code(*mr[0])
        bw.write_code(*mb[0])
        bw.write_code(*ma[0])
    dec = decode_vp8l(b"\x2f" + bw.getvalue())
    assert dec is not None
    _w, _h, _al, px = dec
    greens = px[:, :, 1].reshape(-1).tolist()
    assert greens == [10, 40, 90, 10, 40, 40, 90, 10]
    alphas = px[:, :, 3].reshape(-1).tolist()
    assert alphas == [255] * 8


def test_meta_prefix_image_two_groups():
    """4×1 image, meta block bits=2 → two 4-px blocks... with w=8 two
    meta blocks; group 0 emits green 5, group 1 emits green 9."""
    w, h = 8, 1
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)              # no transforms
    bw.write(0, 1)              # no cache
    bw.write(1, 1)              # meta present
    bw.write(0, 3)              # meta_bits = 2 → blocks of 4
    # meta image: width ceil(8/4)=2, height 1; pixel value encodes
    # (red<<8)|green = group index → greens 0 and 1, red 0
    bw.write(0, 1)              # no cache (meta image)
    mg = _write_prefix_code(bw, {0: 1, 1: 1}, 256 + 24)
    mr = _write_prefix_code(bw, {0: 1}, 256)
    mb = _write_prefix_code(bw, {0: 1}, 256)
    ma = _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    for v in (0, 1):
        bw.write_code(*mg[v])
        bw.write_code(*mr[0])
        bw.write_code(*mb[0])
        bw.write_code(*ma[0])
    # two code groups
    groups = []
    for gv in (5, 9):
        g = _write_prefix_code(bw, {gv: 1}, 256 + 24)
        r = _write_prefix_code(bw, {0: 1}, 256)
        b = _write_prefix_code(bw, {0: 1}, 256)
        a = _write_prefix_code(bw, {255: 1}, 256)
        _write_prefix_code(bw, {0: 1}, 40)
        groups.append((g, gv))
    # all codes are single-symbol → zero payload bits; decode directly
    dec = decode_vp8l(b"\x2f" + bw.getvalue())
    assert dec is not None
    greens = dec[3][:, :, 1].reshape(-1).tolist()
    assert greens == [5] * 4 + [9] * 4


def test_predictor_transform_left_mode():
    """Predictor transform, every block mode 1 (LEFT): residuals
    decode as row-wise cumulative sums. Pinned as the declared
    interpretation of the spec's edge conventions."""
    w, h = 5, 2
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)              # a transform
    bw.write(0, 2)              # PREDICTOR
    bw.write(6, 3)              # size_bits = 8 → one block
    # predictor image 1×1: mode in GREEN channel → green 1
    bw.write(0, 1)              # no cache
    pg = _write_prefix_code(bw, {1: 1}, 256 + 24)
    pr = _write_prefix_code(bw, {0: 1}, 256)
    pb = _write_prefix_code(bw, {0: 1}, 256)
    pa = _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    _ = (pg, pr, pb, pa)        # single-symbol codes: zero bits
    bw.write(0, 1)              # no more transforms
    # residual image: green +3 each pixel, alpha residual 0 except
    # (0,0) which rides on the 0xff000000 seed
    bw.write(0, 1)              # no cache
    bw.write(0, 1)              # no meta
    g = _write_prefix_code(bw, {3: 1}, 256 + 24)
    r = _write_prefix_code(bw, {0: 1}, 256)
    b = _write_prefix_code(bw, {0: 1}, 256)
    a = _write_prefix_code(bw, {0: 1}, 256)
    _write_prefix_code(bw, {0: 1}, 40)
    _ = (g, r, b, a)            # zero bits each
    dec = decode_vp8l(b"\x2f" + bw.getvalue())
    assert dec is not None
    greens = dec[3][:, :, 1]
    # row 0: (0,0) seeded by black (g=0) → 3, then L+3 → 6, 9, 12, 15
    assert greens[0].tolist() == [3, 6, 9, 12, 15]
    # row 1: x=0 is TOP-predicted (3+3=6), then LEFT again
    assert greens[1].tolist() == [6, 9, 12, 15, 18]
    # alpha: seeded 255 at the origin and propagated
    assert (dec[3][:, :, 3] == 255).all()


def test_corrupt_contract():
    good = encode_webp_lossless_gray(
        np.tile(np.arange(16, dtype=np.uint8)[:, None], (1, 9))
    )
    assert decode_webp(None) is None
    assert decode_webp(b"") is None
    for cut in range(0, len(good), 3):
        decode_webp(good[:cut])          # None or parse, never raise
    bad = bytearray(good)
    bad[20] = 0x30                        # break the 0x2f signature
    assert decode_webp(bytes(bad)) is None
    rng = np.random.RandomState(3)
    for _ in range(200):                  # bit-flip fuzz
        fz = bytearray(good)
        for _ in range(3):
            fz[rng.randint(21, len(fz))] ^= 1 << rng.randint(8)
        decode_webp(bytes(fz))            # must never raise
