"""WebP container metadata decode (operators/webp.py, round 13 — r12
verdict #5): header parse for all three variants, the corrupt-payload
contract, chunk-walk alignment, and the Spark features frame. The
media_metadata ``webp`` kind hash-pins the cross-engine replay; these
tests pin the parser itself."""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.webp import (
    parse_webp_metadata,
    synth_webp_extended,
    synth_webp_lossless,
    synth_webp_lossy,
    webp_features_frame,
)


def test_lossy_header():
    meta = parse_webp_metadata(synth_webp_lossy(160, 90))
    assert meta == {
        "format": "lossy", "width": 160, "height": 90,
        "has_alpha": False, "has_anim": False, "n_frames": 1,
    }


def test_lossless_header_and_alpha_bit():
    m0 = parse_webp_metadata(synth_webp_lossless(321, 17, alpha=False))
    m1 = parse_webp_metadata(synth_webp_lossless(321, 17, alpha=True))
    assert (m0["width"], m0["height"]) == (321, 17)
    assert m0["format"] == "lossless"
    assert not m0["has_alpha"] and m1["has_alpha"]
    # 14-bit boundary: the max encodable dimension round-trips
    big = parse_webp_metadata(synth_webp_lossless(16384, 16384, False))
    assert (big["width"], big["height"]) == (16384, 16384)


def test_extended_animation_counting():
    m = parse_webp_metadata(synth_webp_extended(64, 48, alpha=True,
                                                n_frames=5))
    assert m == {
        "format": "extended", "width": 64, "height": 48,
        "has_alpha": True, "has_anim": True, "n_frames": 5,
    }
    # still: 1 frame means no ANIM/ANMF chunks at all
    m1 = parse_webp_metadata(synth_webp_extended(64, 48, alpha=False,
                                                 n_frames=1))
    assert m1["n_frames"] == 1 and not m1["has_anim"]


def test_odd_chunk_padding_alignment():
    """A leading odd-sized metadata chunk must not desync the walk —
    RIFF pads odd bodies with one byte."""
    from petk_spark.operators.webp import _chunk, _riff, _vp8_body

    payload = _riff(
        _chunk(b"XMP ", b"\x01\x02\x03")          # odd size → pad
        + _chunk(b"VP8 ", _vp8_body(33, 44))
    )
    m = parse_webp_metadata(payload)
    assert (m["width"], m["height"]) == (33, 44)


def test_corrupt_contract():
    good = synth_webp_lossy(100, 50)
    assert parse_webp_metadata(None) is None
    assert parse_webp_metadata(b"") is None
    assert parse_webp_metadata(b"RIFF\x00\x00\x00\x00WAVE") is None
    # every byte-prefix truncation: None or a fully-parsed header,
    # never an exception (the stop-at-whole-structure contract)
    for cut in range(len(good)):
        parse_webp_metadata(good[:cut])
    # bad VP8 start code
    bad = bytearray(good)
    bad[23] = 0x99                                # inside 9D 01 2A
    assert parse_webp_metadata(bytes(bad)) is None
    # bad VP8L signature
    lossless = bytearray(synth_webp_lossless(10, 10, False))
    lossless[20] = 0x30                           # != 0x2F
    assert parse_webp_metadata(bytes(lossless)) is None


def test_features_frame_and_decode_image_policy(spark):
    from petk_spark.operators.multimodal import _decode_image

    rows = [
        (0, synth_webp_lossy(20, 10)),
        (1, synth_webp_lossless(7, 9, alpha=True)),
        (2, synth_webp_extended(32, 16, alpha=False, n_frames=3)),
        (3, b"garbage"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["id"]: r for r in webp_features_frame(
            df, "doc_id", "payload"
        ).collect()
    }
    assert got[0]["valid"] and got[0]["format"] == "lossy"
    assert (got[0]["width"], got[0]["height"]) == (20, 10)
    assert got[1]["n_channels"] == 4              # alpha
    assert got[2]["n_frames"] == 3
    assert not got[3]["valid"] and got[3]["width"] is None
    assert not got[4]["valid"]
    # _decode_image recognizes the container but stays metadata-only
    with pytest.raises(NotImplementedError, match="WebP"):
        _decode_image(synth_webp_lossy(20, 10))
