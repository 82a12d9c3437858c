"""Baseline JPEG codec (operators/jpeg.py) + its multimodal plumbing —
the round-10 close of the last declared codec seam (r9 verdict #5):
round-trip exactness classes, marker/corruption handling, restart
markers, subsampling, and the Arrow-batched frames."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf hint resolution needs module-level pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petk_spark.operators.jpeg import (
    decode_jpeg,
    encode_baseline_jpeg,
    parse_jpeg,
    synth_jpeg,
    synth_jpeg_blocks,
)
from petk_spark.operators.multimodal import (
    decode_image_features,
    image_average_hash,
    jpeg_features_frame,
    png_average_hash,
    synth_png,
)


def test_flat_gray_bit_exact():
    b = synth_jpeg(20, 12, 77, gray=True, flat=True)
    w, h, nc, px = decode_jpeg(b)
    assert (w, h, nc) == (20, 12, 1)
    assert px.min() == px.max() == 77


@pytest.mark.parametrize("w,h,base", [(20, 12, 5), (47, 39, 96), (16, 16, 0), (9, 25, 150)])
def test_block_constant_bit_exact_and_closed_form_mean(w, h, base):
    """Per-8×8-block-constant images round-trip bit-exactly (AC ≡ 0,
    DC integer) even with partial edge blocks, and the decoded mean is
    the closed form the media_metadata jpeg oracle kind replays."""
    bts = synth_jpeg_blocks(w, h, base)
    ww, hh, nc, px = decode_jpeg(bts)
    yy, xx = np.mgrid[0:h, 0:w]
    want = 20 + (base + 17 * (xx // 8) + 29 * (yy // 8)) % 200
    assert (ww, hh, nc) == (w, h, 1)
    assert (px[:, :, 0].astype(int) == want).all()
    valid, W, H, NC, BD, mean = parse_jpeg(bts)
    assert (valid, W, H, NC, BD) == (True, w, h, 1, 8)
    num = den = 0
    for bx in range((w + 7) // 8):
        for by in range((h + 7) // 8):
            npx = min(8, w - 8 * bx) * min(8, h - 8 * by)
            num += (20 + (base + 17 * bx + 29 * by) % 200) * npx
            den += npx
    assert mean == num / den  # bit-equal double: int sums, one division


def test_gradient_and_color_roundtrip_error_bounds():
    b = synth_jpeg(33, 17, 10, gray=True)
    w, h, nc, px = decode_jpeg(b)
    yy, xx = np.mgrid[0:17, 0:33]
    want = (10 + xx + yy) % 256
    assert np.abs(px[:, :, 0].astype(int) - want).max() <= 1
    # color 4:4:4 — error from YCbCr round trip only
    b = synth_jpeg(24, 24, 60, gray=False)
    w, h, nc, px = decode_jpeg(b)
    assert nc == 3
    base = (60 + np.mgrid[0:24, 0:24][1] + np.mgrid[0:24, 0:24][0]) % 256
    want3 = np.stack([base, np.roll(base, 1, axis=1), 255 - base], axis=2)
    assert np.abs(px.astype(int) - want3).max() <= 2
    # color 4:2:0 flat — chroma subsampling of a constant is exact
    b = synth_jpeg(20, 20, 90, gray=False, subsample=True, flat=True)
    w, h, nc, px = decode_jpeg(b)
    assert nc == 3 and np.abs(px.astype(int) - 90).max() == 0
    # 4:2:0 smooth gradient decodes with bounded error
    b = synth_jpeg(30, 22, 40, gray=False, subsample=True)
    w, h, nc, px = decode_jpeg(b)
    assert (w, h, nc) == (30, 22, 3)


def test_restart_markers():
    arr = ((np.mgrid[0:40, 0:56][0] * 3 + np.mgrid[0:40, 0:56][1] * 5) % 200).astype(np.uint8)
    b = encode_baseline_jpeg(arr, restart_interval=3)
    assert b"\xff\xdd" in b and b"\xff\xd0" in b  # DRI + RST0 present
    w, h, nc, px = decode_jpeg(b)
    assert (w, h) == (56, 40)
    assert np.abs(px[:, :, 0].astype(int) - arr.astype(int)).max() <= 1


def test_invalid_inputs_return_none():
    good = synth_jpeg(16, 16, 10)
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8junkjunk") is None
    assert decode_jpeg(good[: len(good) // 2]) is None  # truncated scan
    assert decode_jpeg(good[:20]) is None               # truncated header
    # flipping SOF0→SOF2 on a BASELINE stream still fails loudly: the
    # baseline scan header (Ss=0, Se=63) is illegal for a progressive
    # DC scan, so the round-12 multi-scan path returns None rather
    # than misreading the sequential entropy data
    i = good.find(b"\xff\xc0")
    assert decode_jpeg(good[: i + 1] + b"\xc2" + good[i + 2 :]) is None
    # 12-bit precision rejected (precision byte is first of SOF body)
    assert decode_jpeg(good[: i + 4] + b"\x0c" + good[i + 5 :]) is None
    assert parse_jpeg(b"\x00" * 40) == (False, None, None, None, None, None)


def test_image_average_hash_dispatch():
    """Format-generic aHash: JPEG branch reproduces the PNG kernel's
    exact arithmetic on the decoded pixels; PNG passthrough unchanged;
    non-image → None."""
    b = synth_jpeg_blocks(40, 28, 33)
    _, _, _, px = decode_jpeg(b)
    h, w = px.shape[:2]
    hs = 8
    sums = [[0] * hs for _ in range(hs)]
    cnts = [[0] * hs for _ in range(hs)]
    for r in range(h):
        for c in range(w):
            sums[r * hs // h][c * hs // w] += int(px[r, c, 0])
            cnts[r * hs // h][c * hs // w] += 1
    means, total = [], 0.0
    for a in range(hs):
        for bb in range(hs):
            m = sums[a][bb] / cnts[a][bb]
            means.append(m)
            total += m
    g = total / 64
    v = 0
    for m in means:
        v = (v << 1) | (1 if m > g else 0)
    assert image_average_hash(b) == format(v, "016x")
    p = synth_png(24, 20, 100, 0)
    assert image_average_hash(p) == png_average_hash(p)
    assert image_average_hash(b"GIF89a" + b"\x00" * 20) is None
    assert image_average_hash(None) is None
    assert image_average_hash(b[:30]) is None


def test_jpeg_features_frame(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        def one(i):
            b = synth_jpeg_blocks(16 + i % 8, 16 + i % 8, i % 50)
            return b[:25] if i % 3 == 0 else b  # every 3rd truncated
        return ids.map(lambda i: one(int(i)))

    df = spark.range(12).select(F.col("id").alias("doc_id"),
                                make(F.col("id")).alias("payload"))
    rows = {r["id"]: r for r in
            jpeg_features_frame(df, "doc_id", "payload").collect()}
    for i in range(12):
        if i % 3 == 0:
            assert rows[i]["valid"] is False and rows[i]["width"] is None
        else:
            assert rows[i]["valid"] is True
            assert rows[i]["width"] == 16 + i % 8
            assert rows[i]["bit_depth"] == 8 and rows[i]["n_channels"] == 1


def test_decode_image_features_mixed_formats(spark):
    """The old stub seam, now REAL: PNG and JPEG rows decode; unknown
    formats and corrupt payloads produce NULL rows, never failures."""
    data = [
        (1, synth_png(20, 18, 40, 2)),
        (2, synth_jpeg_blocks(24, 16, 9)),
        (3, b"GIF89a" + b"\x00" * 30),
        (4, None),
        (5, synth_jpeg(16, 16, 10)[:30]),
    ]
    df = spark.createDataFrame(data, "id long, payload binary")
    rows = {r["id"]: r for r in
            decode_image_features(df, "id", "payload").collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_channels"]) == (20, 18, 3)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["n_channels"]) == (24, 16, 1)
    for bad in (3, 4, 5):
        assert rows[bad]["width"] is None and rows[bad]["mean_luma"] is None


def test_jpeg_hash_pairs_through_hamming_engine(spark):
    """aHash over JPEGs feeds the shared Hamming engine exactly like
    the PNG path (F47's format-generic promise)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from petk_spark.operators.dedup import hamming_near_dup

    imgs = [
        (1, synth_jpeg_blocks(32, 32, 7)),
        (2, synth_jpeg_blocks(32, 32, 7)),      # exact dup
        (3, synth_jpeg_blocks(32, 32, 101)),    # different content
    ]
    df = spark.createDataFrame(imgs, "id long, payload binary")

    @F.pandas_udf(LongType())
    def h64(p: pd.Series) -> pd.Series:
        def one(b):
            hx = image_average_hash(b)
            if hx is None:
                return None
            u = int(hx, 16)
            return u - (1 << 64) if u >= (1 << 63) else u
        return p.map(one)

    fr = df.select("id", h64(F.col("payload")).alias("sig"))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in hamming_near_dup(fr, "id", "sig", 0).collect()}
    assert pairs == {(1, 2): 0}


def test_422_asymmetric_sampling():
    """4:2:2 (h=2, v=1 luma) — the decoder's per-axis upsample ratios
    differ, which 4:2:0 alone never exercises. Flat color is exact;
    a smooth gradient stays within color-round-trip error."""
    b = synth_jpeg(28, 18, 70, gray=False, subsample="422", flat=True)
    w, h, nc, px = decode_jpeg(b)
    assert (w, h, nc) == (28, 18, 3)
    assert np.abs(px.astype(int) - 70).max() == 0
    b = synth_jpeg(30, 22, 40, gray=False, subsample="422")
    w, h, nc, px = decode_jpeg(b)
    assert (w, h, nc) == (30, 22, 3)
    with pytest.raises(ValueError, match="subsample"):
        synth_jpeg(16, 16, 5, gray=False, subsample="411")


def test_image_phash_contract():
    """pHash (round 11): integer-exact DCT hash — deterministic,
    robust to small pixel perturbation, far for unrelated content,
    None for corrupt/too-small. The 16-char hex and its threshold
    convention (strict > the 32nd-smallest coefficient) are the
    oracle-replayed contract."""
    from petk_spark.operators.multimodal import image_phash

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(40, 48), dtype=np.uint8)
    h0 = image_phash(encode_baseline_jpeg(base))
    assert h0 is not None and len(h0) == 16
    # determinism
    assert image_phash(encode_baseline_jpeg(base)) == h0

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    # ±1 noise on every pixel: low-frequency content barely moves
    pert = np.clip(
        base.astype(int) + rng.integers(-1, 2, size=base.shape), 0, 255
    ).astype(np.uint8)
    assert ham(image_phash(encode_baseline_jpeg(pert)), h0) <= 6
    # unrelated noise: ~32 expected, far above any dedup threshold
    other = rng.integers(0, 256, size=(40, 48), dtype=np.uint8)
    assert ham(image_phash(encode_baseline_jpeg(other)), h0) >= 12
    # PNG payloads dispatch through the same kernel
    assert image_phash(synth_png(40, 36, 17, 2)) is not None
    # gates: too small for the exact partition, corrupt, non-image
    assert image_phash(synth_jpeg_blocks(20, 40, 5), dct_size=32) is None
    assert image_phash(synth_jpeg_blocks(20, 40, 5), dct_size=16) is not None
    assert image_phash(b"GIF89a" + b"\x00" * 20) is None
    assert image_phash(None) is None
    assert image_phash(synth_jpeg_blocks(32, 32, 5)[:30]) is None


def test_image_phash_frame_through_hamming_engine(spark):
    """image_phash_frame's phash64 feeds the shared Hamming engine:
    exact dups pair at distance 0, corrupt payloads yield NULL rows
    that produce no pairs."""
    from petk_spark.operators.dedup import hamming_near_dup
    from petk_spark.operators.multimodal import image_phash_frame

    imgs = [
        (1, synth_jpeg_blocks(32, 32, 7)),
        (2, synth_jpeg_blocks(32, 32, 7)),   # exact dup
        (3, synth_jpeg_blocks(32, 32, 101)),
        (4, synth_jpeg_blocks(32, 32, 5)[:30]),  # corrupt → NULL
    ]
    df = spark.createDataFrame(imgs, "id long, payload binary")
    fr = image_phash_frame(df, "id", "payload", dct_size=16)
    rows = {r["id"]: r for r in fr.collect()}
    assert rows[4]["phash"] is None and rows[4]["phash64"] is None
    assert rows[1]["phash"] == rows[2]["phash"]
    u = int(rows[1]["phash"], 16)
    assert rows[1]["phash64"] == (u - (1 << 64) if u >= (1 << 63) else u)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in hamming_near_dup(fr, "id", "phash64", 0).collect()}
    assert pairs == {(1, 2): 0}


def test_synth_wav_stereo_tone_mixdown_observable():
    """The stereo fixture carries per-channel-distinct content, so
    mixdown=True and first-channel hashes DIFFER on it (the
    identical-channel synth_wav_tone is mixdown-invariant by
    construction — the reason this fixture exists)."""
    from petk_spark.operators.multimodal import (
        synth_wav_stereo_tone,
        wav_energy_hash,
    )

    b = synth_wav_stereo_tone(8000, 16, 451, k_left=3, k_right=180)
    h_first = wav_energy_hash(b)
    h_mix = wav_energy_hash(b, mixdown=True)
    assert h_first is not None and h_mix is not None
    assert h_first != h_mix
    # degenerate case: identical multipliers → channels identical →
    # mixdown invariance (means scale uniformly by 2)
    same = synth_wav_stereo_tone(8000, 16, 451, k_left=3, k_right=3)
    assert wav_energy_hash(same, mixdown=True) == wav_energy_hash(same)


def test_restart_marker_sequence_enforced():
    """T.81 §B.2.1.2: RSTn sequence numbers cycle 0..7. A stream whose
    restart markers are out of sequence (dropped + reinserted marker)
    must decode to None, not resync at the wrong MCU and return
    shifted pixels (round-10 advisory)."""
    arr = ((np.mgrid[0:40, 0:56][0] * 3 + np.mgrid[0:40, 0:56][1] * 5) % 200).astype(np.uint8)
    good = encode_baseline_jpeg(arr, restart_interval=3)
    assert decode_jpeg(good) is not None
    # entropy data stuffs 0xFF with 0x00, so the first 0xFFD0 after SOS
    # is RST0 — rewrite it as RST1 (out of sequence)
    sos = good.find(b"\xff\xda")
    i = good.find(b"\xff\xd0", sos)
    assert i > 0
    bad = good[:i + 1] + b"\xd1" + good[i + 2:]
    assert decode_jpeg(bad) is None
    # drop RST0 entirely: the next marker the reader meets is RST1
    # where RST0 is expected
    dropped = good[:i] + good[i + 2:]
    assert decode_jpeg(dropped) is None


def test_non_integral_sampling_ratio_rejected():
    """Sampling factor ratios the nearest-neighbor upsample cannot
    express (e.g. luma h=3 against chroma h=2) must return None, never
    a wrong-colors decode (round-10 advisory; libjpeg likewise
    supports only integral ratios)."""
    good = synth_jpeg(16, 8, 70, gray=False, subsample="422", flat=True)
    assert decode_jpeg(good) is not None
    i = good.find(b"\xff\xc0")
    assert i > 0
    # SOF0 body: [len:2][prec:1][h:2][w:2][nc:1] then (id, hv, tq)*3;
    # comp1 hv at i+11, comp2 hv at i+14 — set Y to (3,1), Cb to (2,1):
    # hmax=3, Cb.h=2 → 3 % 2 != 0
    b = bytearray(good)
    assert b[i + 11] == 0x21 and b[i + 14] == 0x11
    b[i + 11] = 0x31
    b[i + 14] = 0x21
    assert decode_jpeg(bytes(b)) is None


def test_image_phash_matches_pure_python_reference():
    """The numpy pHash kernel (reduceat cell sums, int64 matmul) must
    equal a straight pure-Python big-int transcription of the
    documented contract — guards the numpy path against silent int64
    overflow or reduceat boundary mistakes, for gray AND color, PNG
    and JPEG, at both dct sizes."""
    from petk_spark.operators.multimodal import (
        _luma_plane,
        _phash_weight_rows,
        image_phash,
    )

    def reference_phash(payload, n, bits=64):
        lum = _luma_plane(payload)
        if lum is None:
            return None
        h, w = lum.shape
        if w < n or h < n:
            return None
        nf = 16 if bits == 128 else 8
        px = [[int(lum[r, c]) for c in range(w)] for r in range(h)]
        S = [[0] * n for _ in range(n)]
        C = [[0] * n for _ in range(n)]
        for r in range(h):
            for c in range(w):
                a, b = r * n // h, c * n // w
                S[a][b] += px[r][c]
                C[a][b] += 1
        M = [[(2 * S[a][b] + C[a][b]) // (2 * C[a][b]) for b in range(n)]
             for a in range(n)]
        Wr = _phash_weight_rows(n, nf)
        Wc = _phash_weight_rows(n, 8)
        flat = []
        for u in range(nf):
            for v in range(8):
                flat.append(sum(
                    Wr[u][a] * M[a][b] * Wc[v][b]
                    for a in range(n) for b in range(n)
                ))
        thr = sorted(flat)[bits // 2 - 1]
        out = 0
        for x in flat:
            out = (out << 1) | (1 if x > thr else 0)
        return format(out, f"0{bits // 4}x")

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(36, 41), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(33, 38, 3), dtype=np.uint8)
    cases = [
        (encode_baseline_jpeg(gray), 32),
        (encode_baseline_jpeg(gray), 16),
        (encode_baseline_jpeg(rgb), 16),  # color: luma = R+G+B sum
        (synth_png(40, 36, 17, 2), 16),   # PNG RGB
        (synth_png(34, 40, 90, 0), 32),   # PNG gray
        (synth_jpeg_blocks(47, 39, 96), 16),
    ]
    for payload, n in cases:
        assert image_phash(payload, n) == reference_phash(payload, n)
        # the 128-bit wide form (round 12): 16×8 frequency block,
        # median threshold over 128 coefficients, 32 hex chars
        assert image_phash(payload, n, bits=128) == reference_phash(
            payload, n, bits=128
        )
    # the 64-bit hash is NOT a prefix of the 128-bit one (different
    # threshold), but both must exist and differ in length
    h64 = image_phash(cases[0][0], 32)
    h128 = image_phash(cases[0][0], 32, bits=128)
    assert len(h64) == 16 and len(h128) == 32


# ---------------------------------------------------------------------------
# Hypothesis fuzz: arbitrary pixel content (worst case for the Huffman
# category ladder and IDCT rounding — the smooth-gradient tests above
# never emit large AC coefficients), arbitrary dims incl. partial edge
# blocks, restart intervals, and all three subsampling modes.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
    rst=st.sampled_from([0, 1, 3]),
)
def test_fuzz_noise_roundtrip_gray(w, h, seed, rst):
    """White-noise gray images round-trip within ±2 at quant=1 (the
    encoder writes integer DCT coefficients, so the only loss is
    coefficient rounding; measured worst error on noise is 1)."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    b = encode_baseline_jpeg(arr, restart_interval=rst)
    ww, hh, nc, px = decode_jpeg(b)
    assert (ww, hh, nc) == (w, h, 1)
    assert np.abs(px[:, :, 0].astype(int) - arr.astype(int)).max() <= 2


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**32 - 1),
    mode=st.sampled_from([False, True, "422"]),
)
def test_fuzz_noise_roundtrip_neutral_rgb(w, h, seed, mode):
    """Chroma-neutral (r=g=b) noise: Cb=Cr=128 exactly, so EVERY
    subsampling mode averages a constant chroma plane — the luma
    channel carries all the content and the round trip stays within
    the same ±2 bound under 4:4:4, 4:2:0 AND 4:2:2."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    arr = np.stack([g, g, g], axis=2)
    b = encode_baseline_jpeg(arr, subsample=mode)
    ww, hh, nc, px = decode_jpeg(b)
    assert (ww, hh, nc) == (w, h, 3)
    assert np.abs(px.astype(int) - arr.astype(int)).max() <= 2


@pytest.mark.slow
@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    cut=st.integers(0, 1000),
    flip_pos=st.integers(0, 1000),
    flip_val=st.integers(0, 255),
    trunc=st.booleans(),
)
def test_fuzz_corruption_never_raises(seed, cut, flip_pos, flip_val, trunc):
    """decode_jpeg on corrupted bytes must NEVER raise — corrupt
    payloads in a 100 TB corpus yield NULL rows, not task failures.
    Random truncation or a single byte flip anywhere in a valid stream
    either still decodes to a well-formed (w, h, nc, pixels) tuple or
    returns None."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    b = bytearray(encode_baseline_jpeg(arr))
    if trunc:
        b = b[: cut % max(1, len(b))]
    else:
        p = flip_pos % len(b)
        b[p] = flip_val
    out = decode_jpeg(bytes(b))
    if out is not None:
        ww, hh, nc, px = out
        assert px.shape == (hh, ww, nc)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — round 12 (r11 verdict #2)
# ---------------------------------------------------------------------------

from petk_spark.operators.jpeg import encode_progressive_jpeg  # noqa: E402


def test_progressive_flat_blocks_bit_exact():
    """Block-constant gray through the full progressive scan script
    (DC first/refine, AC first in two spectral bands, AC refine) is
    bit-lossless at quant=1 — the same exactness class the baseline
    `jpeg` twin kind relies on, so `jpeg_prog` can share its
    closed-form oracle arithmetic."""
    yy, xx = np.mgrid[0:20, 0:33]
    img = (20 + (5 + 17 * (xx // 8) + 29 * (yy // 8)) % 200).astype(np.uint8)
    w, h, nc, px = decode_jpeg(encode_progressive_jpeg(img))
    assert (w, h, nc) == (33, 20, 1)
    assert np.array_equal(px[:, :, 0], img)


def test_progressive_equals_baseline_decode():
    """Every progressive pass ends at Al=0, so the transmitted
    quantized coefficients are identical to the baseline encoding of
    the same image — the two decodes must agree BIT FOR BIT on noise
    (dense AC content exercises EOB runs, ZRLs, correction bits) for
    gray and all three color subsampling modes."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (37, 41), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_baseline_jpeg(g))[3],
        decode_jpeg(encode_progressive_jpeg(g))[3],
    )
    img3 = rng.integers(0, 256, (29, 35, 3), dtype=np.uint8)
    for mode in (False, "420", "422"):
        pb = decode_jpeg(encode_baseline_jpeg(img3, subsample=mode))
        pp = decode_jpeg(encode_progressive_jpeg(img3, subsample=mode))
        assert pp is not None
        assert np.array_equal(pb[3], pp[3]), mode


def test_progressive_restart_markers_every_scan():
    """restart_interval writes RSTn into EVERY scan of the script
    (interleaved DC scans count MCUs, single-component AC scans count
    data units); the decode must resync (and reset DC predictors and
    EOB runs) at each — and still match the baseline decode."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    base = decode_jpeg(encode_baseline_jpeg(img))[3]
    for ri in (1, 3, 7):
        out = decode_jpeg(encode_progressive_jpeg(img, restart_interval=ri))
        assert out is not None, ri
        assert np.array_equal(out[3], base), ri


def test_progressive_dropped_restart_returns_none():
    """Excising one RSTn from a progressive scan must yield None (the
    modulo-8 sequence check), never shifted pixels — same contract as
    the sequential path."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    b = encode_progressive_jpeg(img, restart_interval=2)
    i = b.find(b"\xff\xd1")  # RST1 — drop it so RST2 arrives when 1 expected
    assert i > 0
    assert decode_jpeg(b[:i] + b[i + 2 :]) is None


def test_progressive_spectral_splits_and_quant():
    """The spectral-selection boundary and the quant table are free
    parameters of the script; every combination still reproduces the
    baseline decode exactly."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (19, 22), dtype=np.uint8)
    for split in (1, 20, 62):
        for qv in (1, 3):
            pb = decode_jpeg(encode_baseline_jpeg(img, quant=qv))
            pp = decode_jpeg(
                encode_progressive_jpeg(img, quant=qv, spectral_split=split)
            )
            assert np.array_equal(pb[3], pp[3]), (split, qv)


def test_progressive_parse_jpeg_dispatch():
    """parse_jpeg (the metadata surface the media twin hashes) gets
    progressive support for free through decode_jpeg."""
    img = np.full((16, 24), 77, dtype=np.uint8)
    valid, w, h, nc, depth, mean = parse_jpeg(encode_progressive_jpeg(img))
    assert (valid, w, h, nc, depth) == (True, 24, 16, 1, 8)
    assert mean == 77.0


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**32 - 1),
    rst=st.sampled_from([0, 0, 2, 5]),
)
def test_fuzz_progressive_equals_baseline(w, h, seed, rst):
    """Property: for ANY gray image, progressive and baseline decodes
    are bitwise identical (both transmit the same quantized
    coefficients losslessly)."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    pb = decode_jpeg(encode_baseline_jpeg(arr))
    pp = decode_jpeg(encode_progressive_jpeg(arr, restart_interval=rst))
    assert pp is not None
    assert np.array_equal(pb[3], pp[3])


@pytest.mark.slow
@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    cut=st.integers(0, 2000),
    flip_pos=st.integers(0, 2000),
    flip_val=st.integers(0, 255),
    trunc=st.booleans(),
)
def test_fuzz_progressive_corruption_never_raises(
    seed, cut, flip_pos, flip_val, trunc
):
    """Same never-raise contract as the sequential fuzz, over the
    multi-scan path: truncation can land between scans, inside a scan
    header, or mid-entropy-data; a flip can corrupt a later scan after
    earlier ones decoded fine."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    b = bytearray(encode_progressive_jpeg(arr, restart_interval=3))
    if trunc:
        b = b[: cut % max(1, len(b))]
    else:
        p = flip_pos % len(b)
        b[p] = flip_val
    out = decode_jpeg(bytes(b))
    if out is not None:
        ww, hh, nc, px = out
        assert px.shape == (hh, ww, nc)


# ---------------------------------------------------------------------------
# 128-bit pHash + wide Hamming blocking — round 12 (r11 verdict #4)
# ---------------------------------------------------------------------------


def test_hamming_near_dup_128bit_brute_force_parity(spark):
    """Multi-word (128-bit) hamming_near_dup equals the all-pairs
    brute force at every blocking geometry — clean 64/32/16-bit blocks
    (max_hamming 1/3/7), word-straddling widths (2 → 42 bits,
    4 → 25 bits), and the degenerate exact-grouping distance 0."""
    import itertools
    import random

    from petk_spark.operators.dedup import hamming_near_dup

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    rng = random.Random(42)
    sigs = {}
    rid = 0
    for b in [rng.getrandbits(128) for _ in range(12)]:
        for _ in range(rng.randint(1, 4)):
            v = b
            for _ in range(rng.randint(0, 6)):
                v ^= 1 << rng.randrange(128)
            sigs[rid] = v
            rid += 1
    df = spark.createDataFrame(
        [(i, signed(v >> 64), signed(v & ((1 << 64) - 1)))
         for i, v in sigs.items()],
        "id long, hi long, lo long",
    )
    for mh in (0, 1, 2, 3, 4, 7):
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_near_dup(
                df, "id", ["hi", "lo"], max_hamming=mh, persist=False
            ).collect()
        )
        want = sorted(
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= mh
        )
        assert got == want, mh


def test_hamming_near_dup_wide_null_word_and_validation(spark):
    """A signature with ANY null word produces no pairs; out-of-range
    max_hamming and blocks-wider-than-a-long geometries are rejected
    loudly."""
    from petk_spark.operators.dedup import hamming_near_dup

    df = spark.createDataFrame(
        [(1, 5, 9), (2, 5, 9), (3, None, 9), (4, 5, None)],
        "id long, hi long, lo long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup(
            df, "id", ["hi", "lo"], max_hamming=3, persist=False
        ).collect()
    }
    assert pairs == {(1, 2): 0}
    with pytest.raises(ValueError, match=r"\[0, 127\]"):
        hamming_near_dup(df, "id", ["hi", "lo"], max_hamming=128)
    with pytest.raises(ValueError, match="wider than 64 bits"):
        # 3 words = 192 bits; max_hamming=1 would need 96-bit blocks
        hamming_near_dup(
            spark.createDataFrame([(1, 1, 1, 1)], "id long, a long, b long, c long"),
            "id", ["a", "b", "c"], max_hamming=1,
        )


def test_image_phash128_frame_through_wide_hamming(spark):
    """The 128-bit image_phash_frame output (phash_hi/phash_lo) drops
    into the widened Hamming engine: exact dups at distance 0 with
    32-BIT block keys (max_hamming=3 over 128 bits), corrupt payloads
    → NULL words → no pairs, and the hex column is the two words
    re-concatenated."""
    from petk_spark.operators.dedup import hamming_near_dup
    from petk_spark.operators.multimodal import image_phash_frame

    imgs = [
        (1, synth_jpeg_blocks(32, 32, 7)),
        (2, synth_jpeg_blocks(32, 32, 7)),   # exact dup
        (3, synth_jpeg_blocks(32, 32, 101)),
        (4, synth_jpeg_blocks(32, 32, 5)[:30]),  # corrupt → NULL
    ]
    df = spark.createDataFrame(imgs, "id long, payload binary")
    fr = image_phash_frame(df, "id", "payload", dct_size=16, bits=128)
    rows = {r["id"]: r for r in fr.collect()}
    assert rows[4]["phash"] is None
    assert rows[4]["phash_hi"] is None and rows[4]["phash_lo"] is None
    assert rows[1]["phash"] == rows[2]["phash"]
    assert len(rows[1]["phash"]) == 32

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    u = int(rows[1]["phash"], 16)
    assert rows[1]["phash_hi"] == signed(u >> 64)
    assert rows[1]["phash_lo"] == signed(u & ((1 << 64) - 1))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup(
            fr, "id", ["phash_hi", "phash_lo"], max_hamming=3, persist=False
        ).collect()
    }
    assert pairs == {(1, 2): 0}


def test_perceptual_hashes_progressive_transparent():
    """The F47 hashes see pixels, not encodings: a progressive
    re-encode of the same image yields the SAME aHash and pHash (64
    and 128 bit) as the baseline encoding — so a crawl corpus mixing
    baseline and progressive copies of one image dedupes at Hamming
    distance 0 with no special-casing."""
    from petk_spark.operators.jpeg import encode_progressive_jpeg
    from petk_spark.operators.multimodal import image_average_hash, image_phash

    yy, xx = np.mgrid[0:24, 0:40]
    img = (20 + (9 + 17 * (xx // 8) + 29 * (yy // 8)) % 200).astype(np.uint8)
    b = encode_baseline_jpeg(img)
    p = encode_progressive_jpeg(img)
    assert p[:4] != b[:4] or p != b  # genuinely different encodings
    assert image_average_hash(p) == image_average_hash(b) is not None
    assert image_phash(p, 16) == image_phash(b, 16) is not None
    assert image_phash(p, 16, bits=128) == image_phash(b, 16, bits=128)
