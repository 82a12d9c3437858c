"""Chunking/packing invariants: full token coverage with the declared
overlap, short-doc and null handling, and the pack-overrun bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from petk_spark.operators.chunking import chunk_documents, pack_sequences

SF = "/root/testdata/sf0.001"


def test_chunks_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, stride=7).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,7,...,90 → 14 chunks; all full-size except the tail
    assert [r.chunk_id for r in rows] == list(range(14))
    assert all(r.n_tokens == 10 for r in rows)
    # coverage: first chunk starts at w0, last chunk ends at w99
    assert rows[0].chunk_text.startswith("w0 ")
    assert rows[-1].chunk_text.endswith(" w99")
    # overlap = chunk - stride = 3 tokens between consecutive chunks
    assert rows[0].chunk_text.split()[-3:] == rows[1].chunk_text.split()[:3]


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=10, stride=7).collect()
    assert {(r.id, r.chunk_id, r.n_tokens, r.chunk_text) for r in rows} == {
        (1, 0, 3, "a b c")
    }


def test_pack_overrun_bounded_and_deterministic(spark):
    rows = [(i, " ".join(["t"] * (13 + i % 37))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.size(F.split(F.col("text"), " "))
    out = pack_sequences(df, "doc_id", toks, target_tokens=100, n_buckets=8)
    packed = out.groupBy("bucket", "pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    # cumsum binning overruns by at most one item
    bad = packed.filter(F.col("tot") > 100 + F.col("mx")).count()
    assert bad == 0
    assert packed.count() > 8  # boundaries actually crossed
    # pure function of the data: identical on recompute
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(13), "doc_id", toks, target_tokens=100, n_buckets=8
    ).collect()))
    assert a == b


def test_wav_parser_roundtrip_and_corruption(spark):
    """The RIFF parser recovers exactly the synthesis parameters from
    real container bytes, and never throws on corrupt input (a 100 TB
    scan must not die on one bad blob)."""
    from petk_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav,
        wav_metadata_frame,
    )

    for rate, ch, bits, frames in [(8000, 1, 8, 1), (44100, 2, 16, 12345)]:
        blob = synth_wav(rate, ch, bits, frames)
        assert parse_wav_header(blob) == (
            True, rate, ch, bits, frames, frames * 1000 // rate
        )
    good = synth_wav(16000, 1, 16, 10)
    for bad in [None, b"", b"RIFF", b"RIFFxxxxWAVE", b"\x00" * 64, good[:30]]:
        assert parse_wav_header(bad)[0] is False  # incl. cut inside fmt
    # bytes missing from the data PAYLOAD leave the header chunks
    # intact: the parser trusts the declared data size (the convention
    # header-only readers follow) and still reports the full frames
    assert parse_wav_header(good[:-3]) == (True, 16000, 1, 16, 10, 0)

    df = spark.createDataFrame(
        [(1, synth_wav(8000, 1, 16, 80)), (2, b"corrupt"), (3, None)],
        "id long, payload binary",
    )
    rows = {r.id: (r.valid, r.sample_rate, r.n_frames)
            for r in wav_metadata_frame(df, "id", "payload").collect()}
    assert rows[1] == (True, 8000, 80)
    assert rows[2][0] is False and rows[3][0] is False


def test_png_decoder_roundtrip_and_corruption(spark):
    """The PNG decoder (CRC-checked chunk walk + inflate + all-5-filter
    unfiltering) recovers exactly the synthesis parameters from real PNG
    bytes, and never throws on corrupt input."""
    from petk_spark.operators.multimodal import (
        parse_png,
        png_features_frame,
        synth_png,
    )

    for w, h, base, ct in [(16, 16, 0, 0), (47, 39, 199, 2), (20, 5, 100, 0)]:
        blob = synth_png(w, h, base, ct)
        nc = 1 if ct == 0 else 3
        # constant-per-row gradient => closed-form exact mean
        assert parse_png(blob) == (True, w, h, nc, 8, base + (h - 1) / 2.0)
    good = synth_png(24, 24, 50, 2)
    for bad in [None, b"", b"\x89PNG", good[:40], good[:100], b"\x00" * 64]:
        assert parse_png(bad)[0] is False
    # bytes missing from the trailing IEND chunk leave the pixel data
    # intact: like the WAV header convention above, the decode succeeds
    assert parse_png(good[:-5])[0] is True
    # single flipped byte anywhere in a chunk => CRC mismatch => invalid
    flipped = bytearray(good)
    flipped[45] ^= 0xFF
    assert parse_png(bytes(flipped))[0] is False

    df = spark.createDataFrame(
        [(1, synth_png(32, 20, 7, 0)), (2, b"corrupt"), (3, None)],
        "id long, payload binary",
    )
    rows = {r.id: (r.valid, r.width, r.height, r.n_channels, r.mean_luma)
            for r in png_features_frame(df, "id", "payload").collect()}
    assert rows[1] == (True, 32, 20, 1, 7 + 19 / 2.0)
    assert rows[2][0] is False and rows[3][0] is False


def test_avi_frame_sampler_roundtrip_and_corruption(spark):
    """The AVI container walk yields exactly the synthesized frame
    chunks in order, sampling respects every_n/max_frames, and corrupt
    payloads contribute no rows instead of throwing."""
    import hashlib

    from petk_spark.operators.multimodal import (
        frame_sample,
        parse_avi_frames,
        synth_avi,
    )

    frames = [f"f{j}-payload".encode() for j in range(7)]
    blob = synth_avi(frames)
    got = list(parse_avi_frames(blob))
    assert [fb for _, fb in got] == frames
    for bad in [None, b"", b"RIFF", b"RIFFxxxxWAVE", blob[:30], b"\x00" * 64]:
        assert list(parse_avi_frames(bad)) == []

    df = spark.createDataFrame(
        [(1, blob), (2, b"corrupt"), (3, None)],
        "id long, payload binary",
    )
    rows = sorted(
        (r.id, r.frame_index, r.frame_digest)
        for r in frame_sample(df, "id", "payload", every_n=3, max_frames=2).collect()
    )
    # doc 1: indices 0 and 3 (every 3rd, capped at 2); docs 2/3: nothing
    assert rows == [
        (1, 0, hashlib.md5(frames[0]).hexdigest()),
        (1, 3, hashlib.md5(frames[3]).hexdigest()),
    ]


def test_end_to_end_training_data_pipeline(spark):
    """The full LLM-training-data story composes: clean the corpus
    (language + quality + exact-fingerprint dedup) → assign
    leakage-proof train/val/test splits keyed on the doc id → chunk
    the kept documents → every chunk inherits exactly its document's
    split (zero leakage) → split fractions are roughly honored → the
    packed sequences and signals frames share the same id space. Pins
    that the operator surfaces actually compose without glue code."""
    from petk_spark.operators.chunking import chunk_documents
    from petk_spark.operators.pipeline import corpus_clean
    from petk_spark.operators.sampling import assign_split
    from petk_spark.operators.text import document_signals_frame

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    kept = corpus_clean(docs, "doc_id", "text", lang="en", min_quality=0.3)
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()

    split = assign_split(
        kept, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, salt="e2e"
    )
    frac = {
        r["split"]: r["n"] / n_kept
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert 0.6 < frac.get("train", 0) < 0.95, frac

    ids = split.select(F.col("id").alias("doc_id"), "split")
    kept_docs = docs.join(ids.select("doc_id"), "doc_id")
    chunks = chunk_documents(kept_docs, "doc_id", "text")
    labeled = chunks.withColumnRenamed("id", "doc_id").join(ids, "doc_id")
    # zero leakage: every chunk of a doc carries exactly one split
    per_doc = labeled.groupBy("doc_id").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_doc.filter(F.col("k") != 1).count() == 0
    assert labeled.count() >= n_kept  # every kept doc chunked (>=1 chunk)

    # the fused signals frame joins 1:1 onto the same id space
    sig = document_signals_frame(docs, "doc_id", "text")
    joined = split.join(sig, "id")
    assert joined.count() == n_kept


# ---------------------------------------------------------------------------
# F47 — perceptual image average-hash + generic Hamming near-dup
# ---------------------------------------------------------------------------


def _gradient_png(w, h, fn):
    """Independent PNG encoder for the test: grayscale, filter-0 rows,
    pixel (r,c) = fn(r,c) — no shared code with the module's synth."""
    import struct
    import zlib

    def chunk(ctype, data):
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for r in range(h):
        raw.append(0)
        raw += bytes(fn(r, c) & 0xFF for c in range(w))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_average_hash_against_bruteforce():
    """Kernel vs an independent brute-force (this test's own block-mean
    arithmetic) on a non-trivial gradient image — pins the integer
    partition (r*8//h), alpha-free luma, mean-of-cell-means threshold
    and MSB-first packing."""
    from petk_spark.operators.multimodal import png_average_hash

    w, h = 37, 23
    fn = lambda r, c: (r * 7 + c * 13) % 256  # noqa: E731
    got = png_average_hash(_gradient_png(w, h, fn))

    sums = [[0] * 8 for _ in range(8)]
    cnts = [[0] * 8 for _ in range(8)]
    for r in range(h):
        for c in range(w):
            sums[r * 8 // h][c * 8 // w] += fn(r, c) % 256
            cnts[r * 8 // h][c * 8 // w] += 1
    means = [sums[a][b] / cnts[a][b] for a in range(8) for b in range(8)]
    t = 0.0
    for m in means:
        t += m
    gm = t / 64
    v = 0
    for m in means:
        v = (v << 1) | (1 if m > gm else 0)
    assert got == format(v, "016x")


def test_png_average_hash_contracts():
    """Brightness invariance (a +k shift moves every cell mean AND the
    threshold equally), near-dup locality (one corrupted corner block
    flips few bits), and the None contracts (corrupt / too small /
    NULL)."""
    from petk_spark.operators.multimodal import png_average_hash, synth_png

    base_img = _gradient_png(32, 32, lambda r, c: (r * 5 + c * 3) % 200)
    brighter = _gradient_png(32, 32, lambda r, c: (r * 5 + c * 3) % 200 + 40)
    assert png_average_hash(base_img) == png_average_hash(brighter)

    corner = _gradient_png(
        32, 32,
        lambda r, c: 255 if (r < 4 and c < 4) else (r * 5 + c * 3) % 200,
    )
    a = int(png_average_hash(base_img), 16)
    b = int(png_average_hash(corner), 16)
    assert 0 < bin(a ^ b).count("1") <= 8
    # color PNG and gray PNG of the same constant-row ramp agree
    assert png_average_hash(synth_png(20, 20, 30, 0)) == png_average_hash(
        synth_png(20, 20, 30, 2)
    )
    assert png_average_hash(b"\x89PNG\r\n\x1a\ngarbage") is None
    assert png_average_hash(_gradient_png(6, 20, lambda r, c: r)) is None
    assert png_average_hash(None) is None


def test_png_ahash_frame_and_hamming_near_dup(spark):
    """The distributed frame + the generic pigeonhole pair engine: the
    signed ahash64 carries the same bits as the hex, NULL payloads make
    no pairs, and hamming_near_dup finds exactly the near pairs."""
    from pyspark.sql.types import BinaryType

    from petk_spark.operators.dedup import hamming_near_dup
    from petk_spark.operators.multimodal import png_ahash_frame

    imgs = [
        (1, _gradient_png(32, 32, lambda r, c: (r * 5 + c * 3) % 200)),
        (2, _gradient_png(32, 32, lambda r, c: (r * 5 + c * 3) % 200 + 40)),
        (3, _gradient_png(
            32, 32,
            lambda r, c: 255 if (r < 4 and c < 4) else (r * 5 + c * 3) % 200,
        )),
        (4, _gradient_png(32, 32, lambda r, c: 255 - ((r * 11 + c) % 256))),
        (5, None),
        (6, b"not a png"),
    ]
    df = spark.createDataFrame(imgs, "id long, payload binary")
    fr = png_ahash_frame(df, "id", "payload")
    rows = {r["id"]: r for r in fr.collect()}
    assert rows[5]["ahash"] is None and rows[6]["ahash64"] is None
    for i in (1, 2, 3, 4):
        u = int(rows[i]["ahash"], 16)
        v = rows[i]["ahash64"]
        assert (v if v >= 0 else v + (1 << 64)) == u
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup(fr, "id", "ahash64", max_hamming=8).collect()
    }
    assert pairs[(1, 2)] == 0
    assert 0 < pairs[(1, 3)] <= 8
    assert not any(5 in p or 6 in p for p in pairs)


def test_simhash_delegates_to_hamming_engine(spark):
    """The refactor is behavior-preserving: simhash_near_dup ==
    hamming_near_dup over the simhash column."""
    from petk_spark.operators.dedup import (
        hamming_near_dup,
        simhash,
        simhash_near_dup,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct = sorted(
        map(tuple, simhash_near_dup(df, "doc_id", "text", 3).collect())
    )
    fp = df.select(
        F.col("doc_id").alias("id"), simhash(F.col("text")).alias("s")
    )
    via = sorted(
        map(tuple, hamming_near_dup(fp, "id", "s", 3).collect())
    )
    assert direct == via and len(direct) > 0


def test_wav_energy_hash_contracts(spark):
    """F48 audio fingerprint: brute-force parity on a tone, amplitude
    invariance under constant re-bias is NOT claimed (energy hash is
    envelope-shaped), corrupt/short/NULL → None, and the frame +
    Hamming engine find the near pair."""
    import struct

    from petk_spark.operators.dedup import hamming_near_dup
    from petk_spark.operators.multimodal import (
        synth_wav,
        synth_wav_tone,
        wav_ahash_frame,
        wav_energy_hash,
    )

    n, k = 453, 5
    got = wav_energy_hash(synth_wav_tone(8000, 2, 16, n, k))
    sums = [0] * 64
    cnts = [0] * 64
    for i in range(n):
        w = i * 64 // n
        sums[w] += abs(((i * k) % 65536) - 32768)
        cnts[w] += 1
    means = [sums[w] / cnts[w] for w in range(64)]
    t = 0.0
    for m in means:
        t += m
    gm = t / 64
    v = 0
    for m in means:
        v = (v << 1) | (1 if m > gm else 0)
    assert got == format(v, "016x")

    # silent audio: every window ties the mean -> strict > gives zeros
    assert wav_energy_hash(synth_wav(8000, 1, 16, 400)) == "0" * 16
    assert wav_energy_hash(b"RIFFjunk") is None
    assert wav_energy_hash(None) is None
    assert wav_energy_hash(synth_wav_tone(8000, 1, 8, 32, 3)) is None  # <64

    # near-dup through the shared engine: same tone in 8- vs 16-bit
    # scales amplitudes but keeps the envelope SHAPE similar
    df = spark.createDataFrame(
        [
            (1, synth_wav_tone(8000, 1, 16, 480, 3)),
            (2, synth_wav_tone(16000, 2, 16, 480, 3)),  # same envelope
            (3, synth_wav_tone(8000, 1, 16, 480, 1000)),  # wrapping tone
            (4, None),
        ],
        "id long, payload binary",
    )
    fr = wav_ahash_frame(df, "id", "payload")
    rows = {r["id"]: r for r in fr.collect()}
    assert rows[1]["whash"] == rows[2]["whash"]  # rate/channels invariant
    assert rows[4]["whash"] is None
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup(fr, "id", "whash64", 10).collect()
    }
    assert pairs[(1, 2)] == 0
    # degenerate thresholds: 0 = exact-dup blocking (one 64-bit block,
    # the all-ones-mask edge); >63 rejected loudly
    from petk_spark.operators.dedup import hamming_near_dup as hnd

    exact = {
        (r["id_a"], r["id_b"])
        for r in hnd(fr, "id", "whash64", 0).collect()
    }
    assert exact == {(1, 2)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hnd(fr, "id", "whash64", 64)


def test_hamming_collapse_matches_bruteforce(spark):
    """Round-10 exact-signature collapse (r9 verdict #3): the blocked
    join now runs on DISTINCT signatures with member re-expansion.
    Pin the full (id_a, id_b, hamming) set against an O(n²) Python
    brute force on a heavily-duplicated corpus — including a duplicated
    id carrying two different signatures (which must not pair with
    itself, the old id_a < id_b filter's contract) — and check the
    plan stays free of cartesian products."""
    import random

    from petk_spark.operators.dedup import hamming_near_dup

    rng = random.Random(7)
    base = [rng.getrandbits(64) for _ in range(12)]
    rows = []
    i = 0
    for s in base:
        # heavy duplication: 1-6 exact copies of each signature,
        # plus 1-bit perturbations
        for _ in range(rng.randint(1, 6)):
            rows.append((i, s)); i += 1
        rows.append((i, s ^ (1 << rng.randrange(64)))); i += 1
    rows.append((0, base[3] ^ 1))  # id 0 again, DIFFERENT signature
    rows.append((999, None))       # NULL never pairs

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    df = spark.createDataFrame(
        [(j, signed(s) if s is not None else None) for j, s in rows],
        "id long, sig long",
    ).repartition(5)

    for mh in (0, 3):
        want = set()
        mat = [(j, s) for j, s in rows if s is not None]
        for ai in range(len(mat)):
            for bi in range(ai + 1, len(mat)):
                (ja, sa), (jb, sb) = mat[ai], mat[bi]
                if ja == jb:
                    continue
                d = bin(sa ^ sb).count("1")
                if d <= mh:
                    want.add((min(ja, jb), max(ja, jb), d))
        got = {
            tuple(r)
            for r in hamming_near_dup(df, "id", "sig", mh).collect()
        }
        assert got == want, f"max_hamming={mh}"

    plan = (
        hamming_near_dup(df, "id", "sig", 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _wav_bytes(fmt_code, channels, bits, n_frames, frame_bytes_fn, rate=8000):
    """Test-local WAV writer with full control over the format code and
    PER-CHANNEL sample bytes (synth_wav_tone writes every channel
    identical, which can't exercise mixdown)."""
    import struct

    block_align = channels * bits // 8
    data = b"".join(frame_bytes_fn(i) for i in range(n_frames))
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, fmt_code, channels, rate,
        rate * block_align, block_align, bits,
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_hash_format_support_and_rejects():
    """Round 12 widens the HASH path (the r9/r10 rejection existed
    because hashing float/24-bit bytes AS <h paired wrong files;
    decoding them properly removes the hazard instead of the files):

    * 24-bit PCM and IEEE-float (format 3, 32-bit) now hash — and
      because the energy hash thresholds window means against their
      own global mean, any positive rescaling of all samples leaves
      the bits invariant, so the 24-bit (×256) and float (÷32768→Q15)
      encodings of the SAME samples hash identically to the 16-bit
      one.
    * WAVE_FORMAT_EXTENSIBLE hashes when its SubFormat GUID is the
      standard PCM/float one; a truncated (16-byte fmt) or corrupted
      GUID still → None — never guessed.
    * format-3 with non-32-bit samples and non-finite float samples
      still → None."""
    import struct

    from petk_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav_float_tone,
        synth_wav_tone,
        wav_energy_hash,
    )

    def s16(i):
        return ((i * 7) % 65536) - 32768

    ref = wav_energy_hash(synth_wav_tone(8000, 1, 16, 200, 7))
    assert ref is not None
    pcm24 = _wav_bytes(
        1, 1, 24, 200,
        lambda i: ((s16(i) * 256) & 0xFFFFFF).to_bytes(3, "little"),
    )
    assert wav_energy_hash(pcm24) == ref  # ×256 rescale: bits invariant
    fl32 = synth_wav_float_tone(8000, 200, 7)
    fl32_ext = synth_wav_float_tone(8000, 200, 7, extensible=True)
    assert wav_energy_hash(fl32) == wav_energy_hash(fl32_ext) == ref
    for payload in (pcm24, fl32):
        valid, rate, ch, bits, frames, _ = parse_wav_header(payload)
        assert valid and frames == 200  # metadata reported as before

    # extensible WITHOUT the 24-byte extension (bare 16-byte fmt): the
    # effective format is unknowable → None (the old r10 reject case)
    ext16 = _wav_bytes(0xFFFE, 1, 16, 200, lambda i: struct.pack("<h", i * 7))
    assert wav_energy_hash(ext16) is None
    # corrupted GUID → None
    b = bytearray(fl32_ext)
    gi = b.find(struct.pack("<H", 3) + b"\x00\x00\x00\x00\x10\x00")
    assert gi > 0
    b[gi + 5] ^= 0xFF
    assert wav_energy_hash(bytes(b)) is None
    # format-3 with 16-bit samples → None
    f3_16 = _wav_bytes(3, 1, 16, 200, lambda i: struct.pack("<h", i * 7))
    assert wav_energy_hash(f3_16) is None
    # a NaN sample → None, never an exception
    nan = bytearray(synth_wav_float_tone(8000, 200, 3))
    off = nan.rfind(b"data") + 8
    nan[off : off + 4] = struct.pack("<f", float("nan"))
    assert wav_energy_hash(bytes(nan)) is None
    # and plain integer PCM still hashes
    ok16 = _wav_bytes(1, 1, 16, 200, lambda i: struct.pack("<h", (i * 37) % 4096))
    assert wav_energy_hash(ok16) is not None


def test_wav_hash_stereo_mixdown():
    """mixdown=True hears all channels; mixdown=False stays the
    first-channel oracle contract. Invariance: adding a silent channel
    never changes the mixdown hash (uniform positive scaling of every
    window mean)."""
    import struct

    from petk_spark.operators.multimodal import wav_energy_hash

    def tone(i):
        return struct.pack("<h", ((i * 91) % 2048) - 1024)

    mono = _wav_bytes(1, 1, 16, 300, tone)
    tone_plus_silence = _wav_bytes(1, 2, 16, 300, lambda i: tone(i) + b"\x00\x00")
    silence_plus_tone = _wav_bytes(1, 2, 16, 300, lambda i: b"\x00\x00" + tone(i))

    h_mono = wav_energy_hash(mono)
    assert h_mono is not None and h_mono != "0" * 16
    # first-channel contract: only channel 1 is heard
    assert wav_energy_hash(tone_plus_silence) == h_mono
    assert wav_energy_hash(silence_plus_tone) == "0" * 16
    # mixdown: silent-channel invariance + panned content heard
    assert wav_energy_hash(tone_plus_silence, mixdown=True) == h_mono
    assert wav_energy_hash(silence_plus_tone, mixdown=True) == h_mono
    # frame variant threads the flag through
    from petk_spark.operators.multimodal import wav_ahash_frame  # noqa: F401


def test_wav_mixdown_frame(spark):
    from petk_spark.operators.multimodal import wav_ahash_frame
    import struct

    def tone(i):
        return struct.pack("<h", ((i * 91) % 2048) - 1024)

    df = spark.createDataFrame(
        [
            (1, _wav_bytes(1, 2, 16, 300, lambda i: b"\x00\x00" + tone(i))),
            (2, _wav_bytes(1, 1, 24, 200, lambda i: b"\x00\x01\x02")),
        ],
        "id long, payload binary",
    )
    first = {r["id"]: r["whash"] for r in
             wav_ahash_frame(df, "id", "payload").collect()}
    mixed = {r["id"]: r["whash"] for r in
             wav_ahash_frame(df, "id", "payload", mixdown=True).collect()}
    assert first[1] == "0" * 16 and mixed[1] != "0" * 16
    # 24-bit PCM DECODES since round 12; this doc's samples are a
    # constant, so every window mean ties the global mean and the
    # strict-> threshold packs all-zero bits — on both read modes
    assert first[2] == mixed[2] == "0" * 16


def test_png_adam7_interlace_decode():
    """Adam7-interlaced PNGs (round 12) decode to the SAME pixels as
    their linear encoding across sizes that exercise empty passes
    (w or h < pass offsets), both color types, and every filter type
    (synth cycles r % 5 within each pass); parse/aHash/pHash are
    interlace-transparent; truncation and flips never raise."""
    from petk_spark.operators.multimodal import (
        _png_decode_rows,
        image_phash,
        parse_png,
        png_average_hash,
        synth_png,
    )

    for (w, h, base, ct) in [
        (16, 16, 10, 0), (23, 17, 40, 2), (1, 1, 5, 0), (2, 3, 7, 2),
        (8, 8, 0, 0), (7, 5, 100, 2), (33, 24, 199, 0),
    ]:
        a = _png_decode_rows(synth_png(w, h, base, ct))
        b = _png_decode_rows(synth_png(w, h, base, ct, interlace=True))
        assert a is not None and b is not None, (w, h, ct)
        assert a[:3] == b[:3]
        assert [bytes(r) for r in a[3]] == [bytes(r) for r in b[3]], (w, h, ct)

    p = synth_png(24, 20, 33, 2)
    pi = synth_png(24, 20, 33, 2, interlace=True)
    assert pi != p
    assert parse_png(p) == parse_png(pi)
    assert png_average_hash(p) == png_average_hash(pi) is not None
    assert image_phash(p, 16) == image_phash(pi, 16) is not None

    for cut in range(0, len(pi), 13):
        r = _png_decode_rows(pi[:cut])
        assert r is None or len(r[3]) == 20
    for flip in range(8, len(pi), 17):
        bb = bytearray(pi)
        bb[flip] ^= 0x41
        _png_decode_rows(bytes(bb))  # None or valid, never raises


def test_png_adam7_fuzz_random_content():
    """Property over ARBITRARY pixel content (constant-row synth can
    mask scatter/offset bugs whose misplaced pixels happen to carry
    equal values): random images written linearly and Adam7-interlaced
    with the module's own filter/chunk helpers decode to identical
    rows."""
    import struct
    import zlib

    import numpy as np

    from petk_spark.operators.multimodal import (
        _ADAM7,
        PNG_SIGNATURE,
        _filter_rows,
        _png_chunk,
        _png_decode_rows,
    )

    def write_png(rows, w, h, ct, interlace):
        bpp = 1 if ct == 0 else 3
        if not interlace:
            raw = _filter_rows(rows, bpp)
        else:
            raw = bytearray()
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                prows = [
                    bytes(
                        b
                        for k in range(pw)
                        for b in rows[y0 + j * dy][
                            (x0 + k * dx) * bpp : (x0 + k * dx + 1) * bpp
                        ]
                    )
                    for j in range(ph)
                ]
                raw += _filter_rows(prows, bpp)
        ihdr = struct.pack(
            ">IIBBBBB", w, h, 8, ct, 0, 0, 1 if interlace else 0
        )
        return (
            PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(29)
    for trial in range(12):
        w = int(rng.integers(1, 30))
        h = int(rng.integers(1, 30))
        ct = int(rng.choice([0, 2]))
        bpp = 1 if ct == 0 else 3
        rows = [bytes(rng.integers(0, 256, w * bpp, dtype=np.uint8))
                for _ in range(h)]
        lin = _png_decode_rows(write_png(rows, w, h, ct, False))
        itl = _png_decode_rows(write_png(rows, w, h, ct, True))
        assert lin is not None and itl is not None, (w, h, ct)
        assert [bytes(r) for r in lin[3]] == rows == [bytes(r) for r in itl[3]], (
            w, h, ct, trial,
        )
