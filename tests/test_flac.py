"""FLAC STREAMINFO metadata (operators/multimodal.py, round 13):
bit-field extraction, the metadata-block walk, and the corrupt
contract. The media_metadata ``flac`` kind hash-pins the cross-engine
replay; these tests pin the parser."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.multimodal import (
    flac_features_frame,
    parse_flac_metadata,
    synth_flac,
)


def test_streaminfo_fields():
    m = parse_flac_metadata(synth_flac(44100, 2, 16, 441000))
    assert m == {
        "sample_rate": 44100, "n_channels": 2, "bits_per_sample": 16,
        "n_frames": 441000, "duration_ms": 10000,
    }
    # 20-bit rate / 3-bit channels / 5-bit bps boundaries round-trip
    m = parse_flac_metadata(synth_flac(655350, 8, 32, (1 << 36) - 1))
    assert m["sample_rate"] == 655350
    assert m["n_channels"] == 8 and m["bits_per_sample"] == 32
    assert m["n_frames"] == (1 << 36) - 1


def test_padding_block_walk():
    m = parse_flac_metadata(synth_flac(96000, 1, 24, 9600,
                                       with_padding=True))
    assert m["sample_rate"] == 96000 and m["duration_ms"] == 100


def test_corrupt_contract():
    good = synth_flac(48000, 2, 16, 48000)
    assert parse_flac_metadata(None) is None
    assert parse_flac_metadata(b"") is None
    assert parse_flac_metadata(b"fLaX" + good[4:]) is None
    for cut in range(len(good)):
        parse_flac_metadata(good[:cut])      # never raises
    assert parse_flac_metadata(good[:20]) is None   # truncated block
    # zero sample rate is invalid
    assert parse_flac_metadata(synth_flac(0, 1, 16, 100)) is None


def test_features_frame(spark):
    rows = [
        (0, synth_flac(44100, 2, 16, 22050)),
        (1, synth_flac(8000, 1, 8, 800, with_padding=True)),
        (2, b"junk"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["id"]: r for r in flac_features_frame(
            df, "doc_id", "payload"
        ).collect()
    }
    assert got[0]["valid"] and got[0]["duration_ms"] == 500
    assert got[1]["sample_rate"] == 8000 and got[1]["duration_ms"] == 100
    assert not got[2]["valid"] and not got[3]["valid"]
