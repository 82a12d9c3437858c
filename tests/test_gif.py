"""GIF codec (operators/gif.py, round 12 — F52): LZW round trips on
both encoder paths (the real table compressor and the independent
"uncompressed" literal stream), width-growth and 12-bit-reset
boundaries, 4-pass interlace, animation frame counting, the
corruption contract, and the Spark feature-frame surface. The
`media_metadata` kind `gif` hash-pins the closed-form fixture decode
against DuckDB."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.gif import (
    decode_gif,
    encode_gif,
    encode_gif_uncompressed,
    gif_mean_luma,
    lzw_decode,
    lzw_encode,
)

RNG = np.random.default_rng(20260816)


@pytest.mark.parametrize(
    "size,alpha",
    [(100, 4), (5000, 8), (20000, 2), (70000, 256), (300000, 256)],
)
def test_lzw_round_trip_both_paths(size, alpha):
    """Random data through the real compressor AND the tableless
    literal stream — sizes chosen to cross every width bump and (at
    300k) the 12-bit table reset."""
    mcs = max(2, (alpha - 1).bit_length())
    data = RNG.integers(0, alpha, size=size, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, mcs), mcs, size) == data
    assert lzw_decode(encode_gif_uncompressed(data, mcs), mcs, size) == data


def test_lzw_compressible_exercises_code_eq_table_case():
    """Repetitive data drives the decoder's code==len(table)
    (KwKwK) branch and deep chains through multiple resets."""
    rep = (b"\x01\x02\x03" * 40000) + bytes(range(256)) * 20 + b"\x07" * 5000
    assert lzw_decode(lzw_encode(rep, 8), 8, len(rep)) == rep


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("n_frames", [1, 3])
def test_gif_round_trip(interlace, n_frames):
    idx = RNG.integers(0, 237, size=(23, 31), dtype=np.uint8)
    d = decode_gif(encode_gif(idx, interlace=interlace, n_frames=n_frames))
    assert d is not None
    w, h, nf, il, raster, pal = d
    assert (w, h, nf, il) == (31, 23, n_frames, interlace)
    assert np.array_equal(raster, idx)
    assert abs(gif_mean_luma(d) - idx.mean()) < 1e-12


def test_gif_custom_palette_luma():
    pal = [(10, 20, 60), (90, 0, 30)]
    idx = np.array([[0, 1], [1, 1]], np.uint8)
    d = decode_gif(encode_gif(idx, palette=pal))
    # luma = (r+g+b)/3 per pixel: (90/3)*3 pixels + (90/3) — wait:
    # slot0 = 90/3 = 30, slot1 = 120/3 = 40; mean = (30 + 3*40)/4
    assert abs(gif_mean_luma(d) - (30 + 3 * 40) / 4.0) < 1e-12
    assert d[5].shape[0] >= 2  # palette padded to a power of two


def test_gif_uncompressed_payload_decodes():
    idx = RNG.integers(0, 250, size=(17, 19), dtype=np.uint8)
    d = decode_gif(encode_gif(idx, uncompressed=True))
    assert d is not None and np.array_equal(d[4], idx)


def test_fixture_closed_form_mean():
    """The media_metadata oracle contract: constant rows base+r under
    the gray palette give mean base + (h-1)/2 exactly."""
    base, w, h = 150, 20, 18
    fix = np.tile(
        (base + np.arange(h, dtype=np.int64)).astype(np.uint8), (w, 1)
    ).T
    for il in (False, True):
        d = decode_gif(encode_gif(np.ascontiguousarray(fix), interlace=il))
        assert gif_mean_luma(d) == base + (h - 1) / 2.0


def test_corruption_contract():
    idx = RNG.integers(0, 250, size=(17, 19), dtype=np.uint8)
    blob = encode_gif(idx)
    for cut in range(0, len(blob)):
        r = decode_gif(blob[:cut])
        # a truncation may still contain a complete first frame (e.g.
        # missing trailer only); it must never return wrong pixels
        assert r is None or np.array_equal(r[4], idx), cut
    for _ in range(200):
        b = bytearray(blob)
        for _ in range(int(RNG.integers(1, 6))):
            b[int(RNG.integers(0, len(b)))] = int(RNG.integers(0, 256))
        decode_gif(bytes(b))  # never raises
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(b"notagif") is None
    assert decode_gif(None) is None


def test_header_bytes_are_real_gif():
    idx = np.zeros((4, 6), np.uint8)
    blob = encode_gif(idx)
    assert blob[:6] == b"GIF89a"
    assert int.from_bytes(blob[6:8], "little") == 6  # width
    assert int.from_bytes(blob[8:10], "little") == 4  # height
    assert blob[10] & 0x80  # global color table present
    assert blob[-1:] == b"\x3b"  # trailer


def test_gif_features_frame_spark(spark):
    from petk_spark.operators.multimodal import gif_features_frame

    idx = RNG.integers(0, 200, size=(9, 11), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_gif(idx, n_frames=2, interlace=True))),
        (1, bytearray(b"corrupt bytes")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["id"]: r for r in gif_features_frame(df, "doc_id", "payload").collect()}
    ok = got[0]
    assert ok["valid"] and (ok["width"], ok["height"], ok["n_frames"]) == (11, 9, 2)
    assert abs(ok["mean_luma"] - idx.mean()) < 1e-12
    assert not got[1]["valid"] and got[1]["width"] is None
    assert not got[2]["valid"]


def test_decode_image_dispatch_includes_gif():
    from petk_spark.operators.multimodal import _decode_image

    idx = RNG.integers(0, 128, size=(8, 8), dtype=np.uint8)
    w, h, nc, luma = _decode_image(encode_gif(idx))
    assert (w, h, nc) == (8, 8, 3)
    assert abs(luma - idx.mean()) < 1e-12
