"""MP3 frame-header metadata (operators/multimodal.py, round 13 —
r12 verdict #6): header field extraction, the exact frame-size step,
ID3v2 skipping, the stop-at-last-whole-frame corruption contract, and
the Spark features frame. The media_metadata ``mp3`` kind hash-pins
the cross-engine replay; these tests pin the parser."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.multimodal import (
    _mp3_frame_size,
    mp3_features_frame,
    parse_mp3_metadata,
    synth_mp3,
)


def test_mpeg1_cbr_closed_form():
    m = parse_mp3_metadata(synth_mp3(40, 128, 44100, version=1))
    assert m == {
        "version": "1", "layer": 3, "bitrate_kbps": 128, "is_cbr": True,
        "sample_rate": 44100, "n_channels": 2, "n_frames": 40,
        "duration_ms": 40 * 1152 * 1000 // 44100,
        "xing_frames": None, "declared_duration_ms": None,
        "title": None, "artist": None,
    }


def test_mpeg2_rates_and_mono():
    m = parse_mp3_metadata(synth_mp3(7, 64, 22050, version=2, mono=True))
    assert m["version"] == "2" and m["sample_rate"] == 22050
    assert m["n_channels"] == 1
    assert m["duration_ms"] == 7 * 576 * 1000 // 22050
    # all three MPEG-1 sample rates round-trip
    for rate in (44100, 48000, 32000):
        assert parse_mp3_metadata(
            synth_mp3(3, 192, rate)
        )["sample_rate"] == rate


def test_id3v2_skip():
    m = parse_mp3_metadata(synth_mp3(5, 96, 44100, id3_size=517))
    assert m is not None and m["n_frames"] == 5
    assert m["bitrate_kbps"] == 96


def test_stop_at_last_whole_frame():
    good = synth_mp3(6, 128, 44100)
    fs = _mp3_frame_size(3, 128_000, 44100, 0)
    # cut mid-way through the last frame: 5 whole frames remain
    m = parse_mp3_metadata(good[: 5 * fs + fs // 2])
    assert m["n_frames"] == 5
    assert m["duration_ms"] == 5 * 1152 * 1000 // 44100
    # every byte-prefix truncation is None or a parse, never a raise
    for cut in range(0, len(good), 7):
        parse_mp3_metadata(good[:cut])


def test_corrupt_contract():
    assert parse_mp3_metadata(None) is None
    assert parse_mp3_metadata(b"") is None
    assert parse_mp3_metadata(b"\x00" * 64) is None
    bad = bytearray(synth_mp3(3, 128, 44100))
    bad[0] = 0x00                                  # break the sync
    assert parse_mp3_metadata(bytes(bad)) is None
    # free-format (bitrate index 0) and invalid index 15 rejected
    hdr = bytearray(synth_mp3(1, 128, 44100))
    hdr[2] = (0 << 4) | (hdr[2] & 0x0F)
    assert parse_mp3_metadata(bytes(hdr)) is None
    hdr[2] = (15 << 4) | (hdr[2] & 0x0F)
    assert parse_mp3_metadata(bytes(hdr)) is None


def test_id3v24_footer_skip():
    """v2.4 footer flag (header byte 5, bit 0x10): the 10-byte footer
    after the tag payload must be stepped over (round 14, ADVICE)."""
    m = parse_mp3_metadata(
        synth_mp3(5, 96, 44100, id3_size=200, id3_footer=True)
    )
    assert m is not None and m["n_frames"] == 5
    assert m["bitrate_kbps"] == 96


def test_xing_header_declared_frames():
    """Xing VBR header in the first frame: declared frame count vs the
    walked one — truncation shortens walked, not declared."""
    for version, mono, rate, kbps in [
        (1, False, 44100, 128), (1, True, 48000, 96),
        (2, False, 22050, 64), (2, True, 24000, 32),
    ]:
        full = synth_mp3(
            8, kbps, rate, version=version, mono=mono, xing_frames=20
        )
        m = parse_mp3_metadata(full)
        spf = 1152 if version == 1 else 576
        assert m["xing_frames"] == 20, (version, mono)
        assert m["declared_duration_ms"] == 20 * spf * 1000 // rate
        assert m["n_frames"] == 8
        # truncate to 3 whole frames: walked shrinks, declared holds
        from petk_spark.operators.multimodal import _mp3_frame_size
        vbits = 3 if version == 1 else 2
        fs = _mp3_frame_size(vbits, kbps * 1000, rate, 0)
        t = parse_mp3_metadata(full[: 3 * fs + 1])
        assert t["n_frames"] == 3 and t["xing_frames"] == 20
    # an Info tag (CBR spelling) parses the same way
    body = bytearray(synth_mp3(4, 128, 44100, xing_frames=9))
    idx = body.find(b"Xing")
    body[idx : idx + 4] = b"Info"
    assert parse_mp3_metadata(bytes(body))["xing_frames"] == 9
    # no tag → None, and a flags word without the frames bit → None
    assert parse_mp3_metadata(
        synth_mp3(4, 128, 44100)
    )["xing_frames"] is None


def test_vbr_detection():
    a = synth_mp3(3, 128, 44100)
    b = synth_mp3(2, 192, 44100)
    m = parse_mp3_metadata(a + b)
    assert m["n_frames"] == 5
    assert m["is_cbr"] is False
    assert m["bitrate_kbps"] == 128                # first frame's


def test_features_frame(spark):
    rows = [
        (0, synth_mp3(10, 128, 44100)),
        (1, synth_mp3(4, 64, 22050, version=2, mono=True)),
        (2, b"not audio"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["id"]: r for r in mp3_features_frame(
            df, "doc_id", "payload"
        ).collect()
    }
    assert got[0]["valid"] and got[0]["n_frames"] == 10
    assert got[0]["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert got[1]["n_channels"] == 1 and got[1]["version"] == "2"
    assert not got[2]["valid"] and not got[3]["valid"]


def test_id3_text_frames_title_artist():
    # round 16: real TIT2/TPE1 frames inside the ID3v2.4 tag —
    # UTF-8 encoding byte, padding tolerated, footer compatible
    from petk_spark.operators.multimodal import (
        parse_mp3_metadata,
        synth_mp3,
    )

    p = synth_mp3(4, 96, 44100, id3_size=16,
                  id3_tags={"TIT2": "Née Song", "TPE1": "The Crew"})
    m = parse_mp3_metadata(p)
    assert m["title"] == "Née Song" and m["artist"] == "The Crew"
    assert m["n_frames"] == 4             # frame walk unaffected
    p = synth_mp3(3, 56, 22050, version=2, id3_size=8,
                  id3_footer=True, id3_tags={"TIT2": "F"})
    m = parse_mp3_metadata(p)
    assert m["title"] == "F" and m["artist"] is None
    assert m["n_frames"] == 3
    # zero-filled legacy tag and no tag at all -> None
    assert parse_mp3_metadata(
        synth_mp3(3, 96, 44100, id3_size=40)
    )["title"] is None
    assert parse_mp3_metadata(synth_mp3(2, 128, 44100))["title"] is None
