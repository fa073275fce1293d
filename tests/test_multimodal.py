"""Multimodal decode tier tests: stdlib header parsers (PNG/JPEG/GIF/BMP/
WAV/PGM), real PGM pixel decode, dHash perceptual hashing, and the
band-blocked image near-dup join — including corrupt/empty payload
robustness (the poison-row contract at corpus scale)."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from epic_pandas_spark.extensions.multimodal import (
    decode_media_headers,
    decode_pgm,
    dhash64,
    encode_pgm,
    image_dhash,
    mean_pool,
    parse_media_header,
    phash_neardup_pairs,
)


def _png_bytes(w, h, bit_depth=8, color_type=2):
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _jpeg_bytes(w, h, nch=3):
    # SOI, a skippable APP0, then SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"ab"
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + nch * 3, 8, h, w, nch)
    return b"\xff\xd8" + app0 + sof


def _gif_bytes(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h)


def _bmp_bytes(w, h, depth=24):
    return b"BM" + bytes(16) + struct.pack("<ii", w, h) + bytes(2) + struct.pack("<H", depth)


def _wav_bytes(nch, rate, bits):
    block = nch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 4) + bytes(4)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_header_parse_all_formats():
    cases = {
        "png": (_png_bytes(640, 480), dict(width=640, height=480, channels=3, bit_depth=8)),
        "jpeg": (_jpeg_bytes(320, 200), dict(width=320, height=200, channels=3, bit_depth=8)),
        "gif": (_gif_bytes(12, 34), dict(width=12, height=34)),
        "bmp": (_bmp_bytes(100, 50), dict(width=100, height=50, bit_depth=24)),
        "wav": (_wav_bytes(2, 44100, 16), dict(channels=2, sample_rate=44100, bit_depth=16)),
        "pgm": (encode_pgm(np.zeros((5, 7))), dict(width=7, height=5, channels=1, bit_depth=8)),
    }
    for fmt, (payload, expect) in cases.items():
        got = parse_media_header(payload)
        assert got["ok"], (fmt, got["error"])
        assert got["format"] == fmt
        for k, v in expect.items():
            assert got[k] == v, (fmt, k, got)


def test_header_parse_bmp_negative_height_is_topdown():
    got = parse_media_header(_bmp_bytes(10, -20))
    assert got["ok"] and got["height"] == 20


def test_header_parse_corrupt_payloads_never_raise():
    corrupt = [
        b"", b"\x00", b"\x89PNG\r\n\x1a\n",           # truncated after magic
        b"\xff\xd8\xff\xe0",                            # JPEG with no SOF
        b"RIFF\x04\x00\x00\x00WAVE",                    # WAV with no fmt chunk
        b"P5\nnot numbers\n",                           # malformed PGM header
        b"GIF89a\x01",                                  # truncated GIF
        None,
        bytes(1000),                                    # unknown magic
    ]
    for payload in corrupt:
        got = parse_media_header(payload)
        assert got["ok"] is False
        assert got["error"] is not None


def test_decode_media_headers_stage_mixed_batch(spark):
    rows = [
        (1, bytearray(_png_bytes(8, 9))),
        (2, bytearray(_wav_bytes(1, 8000, 8))),
        (3, bytearray(b"garbage")),
        (4, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r.asDict() for r in decode_media_headers(df).collect()}
    assert got[1]["format"] == "png" and got[1]["width"] == 8 and got[1]["ok"]
    assert got[2]["format"] == "wav" and got[2]["sample_rate"] == 8000 and got[2]["ok"]
    assert got[3]["ok"] is False and got[4]["ok"] is False  # poison rows survive


def test_pgm_roundtrip_and_comment_header():
    img = (np.arange(35).reshape(5, 7) * 7 % 256).astype(np.uint8)
    assert np.array_equal(decode_pgm(encode_pgm(img)), img.astype(np.float64))
    with_comment = b"P5\n# a comment\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(decode_pgm(with_comment), img.astype(np.float64))
    with pytest.raises(ValueError, match="truncated raster"):
        decode_pgm(b"P5\n7 5\n255\n" + img.tobytes()[:10])
    with pytest.raises(ValueError, match="not a binary PGM"):
        decode_pgm(b"P6\n1 1\n255\n\x00\x00\x00")


def test_mean_pool_exact_on_tiled_and_uneven():
    base = np.arange(72, dtype=np.float64).reshape(8, 9)
    tiled = np.kron(base, np.ones((4, 4)))
    assert np.allclose(mean_pool(tiled, 8, 9), base)
    # uneven bins still average every source pixel exactly once
    img = np.arange(30, dtype=np.float64).reshape(5, 6)
    pooled = mean_pool(img, 2, 2)
    assert pooled.shape == (2, 2)
    assert np.isclose(pooled.sum() * 0, 0) and np.isclose(
        (pooled * [[2 * 3, 2 * 3], [3 * 3, 3 * 3]]).sum(), img.sum()
    )
    with pytest.raises(ValueError, match="cannot mean-pool"):
        mean_pool(np.zeros((4, 4)), 8, 9)


def test_dhash_brightness_invariance_and_scale_robustness():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 200, (32, 36)).astype(np.float64)
    assert dhash64(img) == dhash64(img + 40)          # uniform brightness shift
    assert dhash64(img) == dhash64(img * 1.2)         # contrast scale
    up = np.kron(img, np.ones((2, 2)))                # 2x upscale, same content
    assert dhash64(up) == dhash64(img)


def test_image_dhash_stage_marks_undecodable(spark):
    ok_img = encode_pgm(np.kron(np.arange(72).reshape(8, 9) % 251, np.ones((4, 4))))
    df = spark.createDataFrame(
        [(1, bytearray(ok_img)), (2, bytearray(b"not an image")), (3, bytearray(b""))],
        "id long, payload binary",
    )
    got = {r["id"]: (r["dhash"], r["ok"]) for r in image_dhash(df).collect()}
    assert got[1][1] is True and got[1][0] is not None
    assert got[2] == (None, False) and got[3] == (None, False)


def test_phash_pairs_find_clone_and_near_clone(spark):
    """An exact clone and a lightly-noised copy must pair with the
    original; unrelated random images must not. Near-dup via the shared
    band-blocked hamming join — exactness vs brute force on this set."""
    rng = np.random.RandomState(7)
    base = rng.randint(40, 200, (8, 9)).astype(np.float64)
    # amplify gradients so +-3 noise cannot flip a sign bit
    base = np.round(mean_pool(np.kron(base, np.ones((4, 4))), 8, 9) / 8) * 8
    clone = base.copy()
    noised = base + rng.randint(-3, 4, base.shape)
    others = [rng.randint(0, 255, (8, 9)).astype(np.float64) for _ in range(5)]
    imgs = [base, clone, noised] + others
    rows = [(i, bytearray(encode_pgm(np.kron(im, np.ones((4, 4)))))) for i, im in enumerate(imgs)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in phash_neardup_pairs(df, max_hamming=3, n_bands=4).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    # brute-force oracle over the same dhashes: identical pair sets
    hashes = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    brute = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert pairs == brute


def test_synth_pgm_payload_cross_group_margin(spark):
    """The registry oracle for multimodal_phash_pairs rests on cross-group
    dHashes being > max_hamming apart — verify the fixed-seed margin for
    all 50 groups through the REAL decode path."""
    from epic_pandas_spark.extensions.multimodal import synth_pgm_payload_udf

    keys = spark.range(50).select(F.col("id").cast("long").alias("k"))
    payloads = keys.withColumn("payload", synth_pgm_payload_udf(50)(F.col("k")))
    hashes = [
        r["dhash"] for r in image_dhash(payloads, "k", "payload").collect()
    ]
    assert len(hashes) == 50 and all(h is not None for h in hashes)
    min_ham = min(
        bin((a ^ b) & (2**64 - 1)).count("1")
        for i, a in enumerate(hashes)
        for b in hashes[i + 1:]
    )
    assert min_ham > 3, f"oracle margin violated: min cross-group hamming {min_ham}"


def test_decode_wav_pcm_variants_and_corruption():
    from epic_pandas_spark.extensions.multimodal import decode_wav_pcm

    def wav(nch, rate, bits, pcm, audio_fmt=1):
        block = max(1, nch * bits // 8)
        fmt = struct.pack("<HHIIHH", audio_fmt, nch, rate, rate * block, block, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 16-bit mono roundtrip
    s16 = np.array([0, 16384, -16384, 32767], dtype="<i2")
    rate, got = decode_wav_pcm(wav(1, 44100, 16, s16.tobytes()))
    assert rate == 44100 and np.allclose(got * 32768.0, s16, atol=0.5)
    # stereo averages to mono
    st = np.array([100, 300, -100, -300], dtype="<i2")  # pairs avg: 200, -200
    _, mono = decode_wav_pcm(wav(2, 8000, 16, st.tobytes()))
    assert np.allclose(mono * 32768.0, [200.0, -200.0])
    # 8-bit is offset-binary
    _, u8 = decode_wav_pcm(wav(1, 8000, 8, bytes([128, 255, 0])))
    assert np.allclose(u8 * 128.0, [0.0, 127.0, -128.0])
    # rejections
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm(b"nope")
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav_pcm(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="PCM"):
        decode_wav_pcm(wav(1, 8000, 16, b"", audio_fmt=3))  # IEEE float


def test_audio_features_stage_marks_undecodable(spark):
    from epic_pandas_spark.extensions.multimodal import (
        audio_features,
        synth_square_wav_udf,
    )

    keys = spark.createDataFrame([(1,), (2,)], "doc_id long")
    wavs = keys.withColumn("payload", synth_square_wav_udf()(F.col("doc_id")))
    bad = spark.createDataFrame(
        [(99, bytearray(b"not audio"))], "doc_id long, payload binary"
    )
    got = {
        r["id"]: r.asDict()
        for r in audio_features(wavs.unionByName(bad), "doc_id", "payload").collect()
    }
    assert got[1]["ok"] and abs(got[1]["rms"] - 0.5) < 1e-12
    assert got[1]["duration_sec"] == 1.0 and got[1]["sample_rate"] == 8000
    assert got[99]["ok"] is False and got[99]["rms"] is None


def test_scene_changes_detects_known_cut(spark):
    from epic_pandas_spark.extensions.multimodal import (
        scene_changes,
        synth_video_payload_udf,
    )

    keys = spark.range(8).select(F.col("id").cast("long").alias("vid"))
    vids = keys.withColumn("payload", synth_video_payload_udf()(F.col("vid")))
    rows = scene_changes(vids, "vid", "payload", frame_size=1165).collect()
    assert len(rows) == 8 * 5  # frames 1..5 per video
    for r in rows:
        if r["frame_idx"] == 3:
            assert r["is_scene_change"] and r["hamming"] > 3
        else:
            assert not r["is_scene_change"] and r["hamming"] == 0


def test_scene_changes_validation_and_corrupt_frames(spark):
    from epic_pandas_spark.extensions.multimodal import scene_changes

    df = spark.createDataFrame([(1, bytearray(b"x" * 100))], "vid long, payload binary")
    with pytest.raises(ValueError, match="frame_size"):
        scene_changes(df, "vid", "payload")
    # frames that don't decode are dropped, not fatal
    got = scene_changes(df, "vid", "payload", frame_size=10).collect()
    assert got == []


def test_dhash_stack_fast_path_equals_per_row():
    """The vectorized same-shape stack path (one reduceat pool + one pack
    for the whole batch) must be bit-identical to per-image dhash64 —
    8-bit and 16-bit, odd non-divisible shapes included."""
    import numpy as np

    from epic_pandas_spark.extensions.multimodal import (
        _dhash_stack,
        decode_pgm,
        dhash64,
        encode_pgm,
    )

    rng = np.random.default_rng(7)
    for h, w in [(8, 9), (33, 41), (64, 64), (11, 9)]:
        imgs = rng.integers(0, 256, size=(6, h, w)).astype(np.float64)
        stacked = _dhash_stack(imgs)
        per_row = [dhash64(im) for im in imgs]
        assert stacked.tolist() == per_row, (h, w)
    # through the full PGM encode->decode path too
    imgs = rng.integers(0, 256, size=(4, 24, 36))
    decoded = np.stack([decode_pgm(encode_pgm(im)) for im in imgs])
    assert _dhash_stack(decoded).tolist() == [dhash64(d) for d in decoded]


def test_image_dhash_mixed_shapes_and_poison(spark):
    """The grouped fast path must handle a batch mixing several image
    shapes, 16-bit rasters, too-small images, and poison payloads — same
    contract as before: good rows hash, bad rows degrade to ok=False."""
    import numpy as np

    from epic_pandas_spark.extensions.multimodal import (
        dhash64,
        decode_pgm,
        encode_pgm,
        image_dhash,
    )

    rng = np.random.default_rng(11)
    a = encode_pgm(rng.integers(0, 256, size=(16, 18)))
    b = encode_pgm(rng.integers(0, 256, size=(40, 33)))
    big16 = b"P5\n12 10\n65535\n" + rng.integers(0, 65536, size=(10, 12)).astype(">u2").tobytes()
    tiny = encode_pgm(np.zeros((4, 4)))          # below pool dims -> ok=False
    junk = b"\x00\x01not an image"
    truncated = a[: len(a) - 5]
    rows = [(0, bytearray(a)), (1, bytearray(b)), (2, bytearray(big16)),
            (3, bytearray(tiny)), (4, bytearray(junk)), (5, bytearray(truncated))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: (r["dhash"], r["ok"]) for r in image_dhash(df).collect()}
    assert got[0] == (dhash64(decode_pgm(a)), True)
    assert got[1] == (dhash64(decode_pgm(b)), True)
    assert got[2] == (dhash64(decode_pgm(big16)), True)
    assert got[3] == (None, False)
    assert got[4] == (None, False)
    assert got[5] == (None, False)
