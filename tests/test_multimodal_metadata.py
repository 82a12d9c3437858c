"""Magic-byte MIME sniffing (round 14, F61): signature dispatch for
the full decoder surface. The media_metadata ``sniff`` kind hash-pins
the doc_id % 8 schedule; these tests pin the classifier itself."""

from __future__ import annotations

def test_sniff_mime_magic_bytes(spark):
    """Round 14 (F61): magic-byte MIME dispatch — every synthesized
    format routes to its token, RIFF sub-types split, truncated-but-
    headed payloads still route (prefix-only by design), junk →
    'unknown', NULL → NULL; plus the Spark frame."""
    from petk_spark.operators.multimodal import (
        mime_sniff_frame,
        sniff_mime,
        synth_flac,
        synth_mp3,
    )

    assert sniff_mime(synth_mp3(2, 128, 44100)) == "mp3"
    assert sniff_mime(synth_mp3(2, 128, 44100, id3_size=40)) == "mp3"
    assert sniff_mime(synth_flac(44100, 2, 16, 100)) == "flac"
    assert sniff_mime(b"GIF89a" + b"\x00" * 4) == "gif"
    assert sniff_mime(b"GIF87a!") == "gif"
    assert sniff_mime(b"\x89PNG\r\n\x1a\n" + b"x") == "png"
    assert sniff_mime(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WAVE") == "wav"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00AVI ") == "avi"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WEBP") == "webp"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00XXXX") == "unknown"
    assert sniff_mime(b"RIFFxxx") == "unknown"      # too short for sub
    assert sniff_mime(b"plain text") == "unknown"
    assert sniff_mime(b"") == "unknown"
    assert sniff_mime(None) is None
    # truncated-but-headed: routes to its decoder, which then rejects
    assert sniff_mime(b"\x89PNG\r\n\x1a\n") == "png"
    rows = [
        (0, synth_mp3(2, 128, 44100)),
        (1, b"\x89PNG\r\n\x1a\nabc"),
        (2, b"junk"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["id"]: r["mime"]
        for r in mime_sniff_frame(df, "doc_id", "payload").collect()
    }
    assert got == {0: "mp3", 1: "png", 2: "unknown", 3: None}


def test_media_features_auto_mixed_frame(spark):
    """Round 14: the one-scan sniff-and-dispatch composite — a mixed
    frame of every format plus junk and NULL comes back as one unified
    metadata row each, fields matching the typed parsers."""
    import numpy as np

    from petk_spark.operators.gif import encode_gif
    from petk_spark.operators.jpeg import encode_baseline_jpeg
    from petk_spark.operators.multimodal import (
        media_features_auto,
        synth_avi,
        synth_flac,
        synth_mp3,
        synth_png,
        synth_wav,
    )
    from petk_spark.operators.vp8l import encode_webp_lossless_gray

    gray = np.full((8, 10), 50, dtype=np.uint8)
    rows = [
        (0, synth_wav(44100, 2, 16, 1000)),
        (1, synth_mp3(6, 128, 44100)),
        (2, synth_flac(48000, 1, 24, 960)),
        (3, synth_png(10, 8, 40, 0)),
        (4, encode_baseline_jpeg(gray)),
        (5, encode_gif(gray)),
        (6, encode_webp_lossless_gray(gray)),
        (7, synth_avi([b"frame0", b"frame1", b"frame2"])),
        (8, b"not media"),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["id"]: r
        for r in media_features_auto(df, "doc_id", "payload").collect()
    }
    assert got[0]["mime"] == "wav" and got[0]["valid"]
    assert got[0]["sample_rate"] == 44100 and got[0]["n_frames"] == 1000
    assert got[1]["mime"] == "mp3" and got[1]["n_frames"] == 6
    assert got[1]["duration_ms"] == 6 * 1152 * 1000 // 44100
    assert got[2]["mime"] == "flac" and got[2]["bits_per_sample"] == 24
    assert got[3]["mime"] == "png" and (got[3]["width"], got[3]["height"]) == (10, 8)
    # png fixture: row r is constant base+r → mean = 40 + (h-1)/2
    assert got[3]["mean_luma"] == 40 + (8 - 1) / 2
    assert got[4]["mime"] == "jpeg" and got[4]["valid"]
    assert abs(got[4]["mean_luma"] - 50.0) < 1.0   # near-lossless flat
    assert got[5]["mime"] == "gif" and got[5]["mean_luma"] == 50.0
    assert got[6]["mime"] == "webp" and got[6]["mean_luma"] == 50.0
    assert (got[6]["width"], got[6]["height"]) == (10, 8)
    assert got[7]["mime"] == "avi" and got[7]["n_frames"] == 3
    assert got[8]["mime"] == "unknown" and not got[8]["valid"]
    assert got[9]["mime"] is None and not got[9]["valid"]
    # corrupt-but-headed: routes by prefix, parser flags invalid
    bad = spark.createDataFrame(
        [(0, b"\x89PNG\r\n\x1a\n truncated")], "doc_id long, payload binary"
    )
    r = media_features_auto(bad, "doc_id", "payload").collect()[0]
    assert r["mime"] == "png" and not r["valid"]
