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
