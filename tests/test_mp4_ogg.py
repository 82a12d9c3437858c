"""MP4/ISO-BMFF + Ogg metadata kinds (round 15, F62/F63 — r14 verdict
#1/#8): box/page walks against closed-form expectations, every-prefix
truncation fuzz (never raises), sniff routing, and the auto-dispatch
equivalence that the composed path emits the typed parsers' fields.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.mp4 import parse_mp4_metadata, synth_mp4
from petk_spark.operators.ogg import parse_ogg_metadata, synth_ogg
from petk_spark.operators.multimodal import sniff_mime, _auto_one


# ---------------------------------------------------------------------------
# mp4
# ---------------------------------------------------------------------------


def test_mp4_closed_form_fields_v0():
    p = synth_mp4(b"isom", 600, 3000, [(320, 240), None], version=0)
    m = parse_mp4_metadata(p)
    assert m == {
        "brand": "isom", "timescale": 600, "duration_ms": 5000,
        "n_tracks": 2, "width": 320, "height": 240,
        "mvhd_version": 0, "codec": None, "language": None,
    }


def test_mp4_stsd_codec_tags():
    # round 16 (r15 verdict #6): the codec is the first VIDEO trak's
    # stsd tag; audio-only files fall back to the first trak's tag
    p = synth_mp4(b"isom", 600, 3000, [None, (320, 240)],
                  track_codecs=[b"mp4a", b"avc1"])
    assert parse_mp4_metadata(p)["codec"] == "avc1"
    p = synth_mp4(b"M4A ", 48000, 96000, [None, None],
                  track_codecs=[b"mp4a", b"mp4a"])
    assert parse_mp4_metadata(p)["codec"] == "mp4a"
    p = synth_mp4(b"mp42", 90000, 5000, [(64, 48)], version=1,
                  moov_largesize=True, track_codecs=[b"hev1"])
    assert parse_mp4_metadata(p)["codec"] == "hev1"
    # traks without stsd keep codec None (pre-r16 shape)
    p = synth_mp4(b"isom", 600, 3000, [(64, 48)])
    assert parse_mp4_metadata(p)["codec"] is None


def test_mp4_mdhd_language():
    # packed 15-bit ISO-639-2/T code: video trak preferred, first-trak
    # fallback; absent mdhd -> None
    p = synth_mp4(b"isom", 600, 3000, [None, (320, 240)],
                  track_codecs=[b"mp4a", b"avc1"],
                  track_langs=["jpn", "eng"])
    m = parse_mp4_metadata(p)
    assert m["language"] == "eng" and m["codec"] == "avc1"
    p = synth_mp4(b"M4A ", 48000, 96000, [None], track_langs=["fra"])
    assert parse_mp4_metadata(p)["language"] == "fra"
    assert parse_mp4_metadata(
        synth_mp4(b"isom", 600, 60, [(8, 8)])
    )["language"] is None
    # v1 layout places the code at body offset 32
    p = synth_mp4(b"mp42", 1000, 10, [(8, 8)], version=1,
                  track_langs=["deu"])
    assert parse_mp4_metadata(p)["language"] == "deu"


def test_mp4_empty_tkhd_at_eof_does_not_raise():
    # r15 ADVICE: an empty tkhd body whose boundary is end-of-file
    # used to IndexError on the version byte read
    import struct

    from petk_spark.operators.mp4 import _box, _mvhd

    moov = _box(b"moov", _mvhd(0, 600, 60)
                + _box(b"trak", _box(b"tkhd", b"")))
    crafted = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomisom"
    ) + moov
    m = parse_mp4_metadata(crafted)
    assert m is not None and m["n_tracks"] == 1 and m["width"] is None


def test_mp4_v1_layout_and_free_box():
    p = synth_mp4(
        b"mp42", 90000, 123456, [None, (1920, 1080), None],
        version=1, with_free=True,
    )
    m = parse_mp4_metadata(p)
    assert m["brand"] == "mp42"
    assert m["timescale"] == 90000
    assert m["duration_ms"] == 123456 * 1000 // 90000
    assert m["n_tracks"] == 3
    assert m["mvhd_version"] == 1
    # dims come from the FIRST video trak, skipping the audio trak
    assert (m["width"], m["height"]) == (1920, 1080)


def test_mp4_largesize_header():
    p = synth_mp4(b"dash", 1000, 777, [(64, 48)], moov_largesize=True)
    m = parse_mp4_metadata(p)
    assert m["duration_ms"] == 777
    assert (m["width"], m["height"]) == (64, 48)


def test_mp4_audio_only_valid_with_null_dims():
    p = synth_mp4(b"M4A ", 44100, 44100 * 7, [None])
    m = parse_mp4_metadata(p)
    assert m["duration_ms"] == 7000
    assert m["width"] is None and m["height"] is None
    assert m["n_tracks"] == 1


def test_mp4_rejects_non_bmff_and_zero_timescale():
    assert parse_mp4_metadata(None) is None
    assert parse_mp4_metadata(b"") is None
    assert parse_mp4_metadata(b"\x00" * 32) is None
    # a RIFF head must not parse as mp4
    assert parse_mp4_metadata(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8) is None
    bad = bytearray(synth_mp4(b"isom", 600, 100, [(8, 8)]))
    # zero out the mvhd timescale (v0 layout: 12 bytes into mvhd body)
    idx = bytes(bad).find(b"mvhd") + 4 + 12
    bad[idx:idx + 4] = b"\x00\x00\x00\x00"
    assert parse_mp4_metadata(bytes(bad)) is None


def test_mp4_every_prefix_truncation_never_raises():
    p = synth_mp4(b"isom", 600, 2400, [(160, 120), None],
                  version=1, with_free=True)
    for cut in range(len(p)):
        parse_mp4_metadata(p[:cut])         # must not raise
    # and the full payload still parses
    assert parse_mp4_metadata(p)["n_tracks"] == 2


# ---------------------------------------------------------------------------
# ogg
# ---------------------------------------------------------------------------


def test_ogg_vorbis_closed_form():
    p = synth_ogg("vorbis", 44100, 2, granule=441000, n_body_pages=2)
    m = parse_ogg_metadata(p)
    assert m == {
        "codec": "vorbis", "sample_rate": 44100, "n_channels": 2,
        "pre_skip": 0, "granule": 441000, "duration_ms": 10000,
        "title": None, "artist": None,
    }


def test_ogg_opus_pre_skip_and_48k_clock():
    # Opus granule clock is ALWAYS 48 kHz regardless of input rate
    p = synth_ogg("opus", 16000, 1, granule=48000 * 3 + 312,
                  pre_skip=312)
    m = parse_ogg_metadata(p)
    assert m["codec"] == "opus"
    assert m["sample_rate"] == 16000       # informational, reported
    assert m["pre_skip"] == 312
    assert m["duration_ms"] == 3000        # (granule - pre_skip)/48k


def test_ogg_rejects_garbage_and_unknown_codec():
    assert parse_ogg_metadata(None) is None
    assert parse_ogg_metadata(b"OggX" + b"\x00" * 40) is None
    # well-formed page, unknown first packet
    from petk_spark.operators.ogg import _page

    p = _page(0x02, 0, 1, 0, b"not-an-ident-header")
    p += _page(0x04, 1000, 1, 1, b"")
    assert parse_ogg_metadata(p) is None


def test_ogg_every_prefix_truncation_never_raises():
    p = synth_ogg("vorbis", 48000, 6, granule=96000, n_body_pages=3)
    for cut in range(len(p)):
        parse_ogg_metadata(p[:cut])
    assert parse_ogg_metadata(p)["duration_ms"] == 2000


# ---------------------------------------------------------------------------
# sniff + auto dispatch
# ---------------------------------------------------------------------------


def test_sniff_routes_mp4_and_ogg():
    assert sniff_mime(synth_mp4(b"isom", 600, 10, [(8, 8)])) == "mp4"
    assert sniff_mime(synth_ogg("opus", 48000, 2, 480)) == "ogg"
    from petk_spark.operators.multimodal import synth_adts

    assert sniff_mime(synth_adts(3, 44100, 2)) == "aac"
    # RIFF split still intact
    assert sniff_mime(b"RIFF\x04\x00\x00\x00WAVE") == "wav"


def test_auto_dispatch_matches_typed_parsers():
    mp4 = synth_mp4(b"mp42", 1000, 2500, [(100, 50), None], version=1)
    row = _auto_one(mp4)
    # (mime, valid, sample_rate, n_channels, bits, n_frames,
    #  duration_ms, width, height, bit_depth, mean_luma)
    assert row[:2] == ("mp4", True)
    assert row[2] == 1000                  # timescale in the rate slot
    assert row[5] == 2                     # trak count in n_frames
    assert row[6] == 2500
    assert (row[7], row[8]) == (100, 50)

    ogg = synth_ogg("vorbis", 22050, 1, granule=22050 * 4)
    row = _auto_one(ogg)
    assert row[:2] == ("ogg", True)
    assert row[2] == 22050 and row[3] == 1
    assert row[6] == 4000

    # corrupt-but-headed → routed, valid=false
    row = _auto_one(mp4[:20])
    assert row[:2] == ("mp4", False)
    row = _auto_one(ogg[:10])
    assert row[:2] == ("ogg", False)


# ---------------------------------------------------------------------------
# ADTS AAC (round 16, r15 verdict #6)
# ---------------------------------------------------------------------------


def test_adts_closed_form_and_truncation():
    from petk_spark.operators.multimodal import (
        parse_adts_metadata,
        synth_adts,
    )

    p = synth_adts(7, 32000, 2, payload_bytes=19)
    m = parse_adts_metadata(p)
    assert m == {
        "sample_rate": 32000, "n_channels": 2, "n_frames": 7,
        "duration_ms": 7 * 1024 * 1000 // 32000,
    }
    # stop-at-last-whole-frame: cutting mid-frame drops that frame
    cut = p[: 3 * (7 + 19) + 10]
    assert parse_adts_metadata(cut)["n_frames"] == 3
    # every-prefix + mutation fuzz never raises
    import random

    rng = random.Random(11)
    for cutn in range(len(p)):
        parse_adts_metadata(p[:cutn])
    for _ in range(2000):
        mut = bytearray(p)
        for _ in range(rng.randint(1, 3)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        parse_adts_metadata(bytes(mut))
    assert parse_adts_metadata(b"") is None
    assert parse_adts_metadata(None) is None


def test_adts_auto_route_and_mp3_disambiguation():
    from petk_spark.operators.multimodal import synth_adts, synth_mp3

    aac = synth_adts(5, 16000, 1)
    row = _auto_one(aac)
    assert row[:2] == ("aac", True)
    assert row[2] == 16000 and row[3] == 1 and row[5] == 5
    assert row[6] == 5 * 1024 * 1000 // 16000
    # MP3's layer bits (non-zero) keep it out of the ADTS branch
    mp3 = synth_mp3(n_frames=3, bitrate_kbps=96, sample_rate=44100)
    assert sniff_mime(mp3) == "mp3"
    assert _auto_one(mp3)[0] == "mp3"
    # layer-00 second byte routes to aac, not mp3 (the r15-noted
    # 0xFF 0xEx false-positive surface shrinks)
    assert sniff_mime(b"\xff\xf1junk") == "aac"
    assert sniff_mime(b"\xff\xe2junk") == "mp3"


def test_ogg_comment_header_tags():
    # round 16: Vorbis-comment TITLE/ARTIST (\x03vorbis / OpusTags),
    # case-insensitive keys, absent header -> None
    p = synth_ogg("vorbis", 44100, 2, 441000, n_body_pages=2,
                  tags={"TITLE": "My Song", "ARTIST": "The Band"})
    m = parse_ogg_metadata(p)
    assert m["title"] == "My Song" and m["artist"] == "The Band"
    assert m["duration_ms"] == 10000      # duration unaffected
    p = synth_ogg("opus", 48000, 2, 48000 * 2 + 99, pre_skip=99,
                  tags={"artist": "Low Key", "TITLE": "T2",
                        "ALBUM": "ignored"})
    m = parse_ogg_metadata(p)
    assert m["title"] == "T2" and m["artist"] == "Low Key"
    assert m["duration_ms"] == 2000
    m = parse_ogg_metadata(synth_ogg("vorbis", 22050, 1, 22050))
    assert m["title"] is None and m["artist"] is None
