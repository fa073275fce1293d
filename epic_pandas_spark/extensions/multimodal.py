"""Multimodal column plumbing (extension layer): image/audio/video as
opaque BinaryType payloads + typed metadata structs, with decode /
feature-extract / resize / frame-sample stages as Arrow-batched
mapInPandas operators.

Decode tiers:

1. **Header decode — REAL, stdlib-only.** PNG / JPEG / GIF / BMP / WAV /
   PGM headers are pure `struct` parses: format, width/height (images) or
   channels/sample-rate/bit-depth (audio) come straight off the bytes.
   Corrupt or truncated payloads degrade to ok=False + error, never an
   exception — at 100 TB some payloads WILL be garbage and a poison row
   must not kill the stage.
2. **Pixel decode — REAL for raw formats.** Binary PGM (P5, the raw
   grayscale member of the Netpbm family) decodes to a numpy array with
   no codec dependency; that feeds a real dHash perceptual hash
   (area-mean resize → horizontal gradient signs → 64-bit fingerprint)
   and hamming near-dup via the shared band-blocked join
   (extensions.dedup.hamming_pairs).
3. **Compressed-pixel decode — optional-dependency gate.** Entropy-coded
   formats (JPEG/PNG pixel data) need a codec; `decode_image_batch`
   upgrades to Pillow when importable and raises NotImplementedError
   otherwise. The mapInPandas wiring around it is identical to tier 2.

`fake_feature_extractor` remains as the deterministic embed stand-in for
pipeline testing.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

MEDIA_SCHEMA = (
    "id long, payload binary, media_type string, "
    "meta struct<byte_len: long, content_hash: long, declared_format: string>"
)

HEADER_SCHEMA = (
    "id long, format string, width int, height int, channels int, "
    "sample_rate int, bit_depth int, ok boolean, error string"
)


def with_media_metadata(df: DataFrame, payload_col: str, fmt_col=None) -> DataFrame:
    """Attach the typed metadata struct computed from the raw payload —
    pure expressions (length/xxhash64), no decode needed. `fmt_col` takes
    a column name (like `payload_col`) or a Column; None → "unknown"."""
    if fmt_col is None:
        fmt = F.lit("unknown")
    elif isinstance(fmt_col, str):
        fmt = F.col(fmt_col)
    else:
        fmt = fmt_col
    return df.withColumn(
        "meta",
        F.struct(
            F.length(F.col(payload_col)).cast("long").alias("byte_len"),
            F.xxhash64(F.col(payload_col)).alias("content_hash"),
            fmt.alias("declared_format"),
        ),
    )


# ---------------------------------------------------------------------------
# tier 1: header decode — pure stdlib struct parsing, no codecs
# ---------------------------------------------------------------------------

def parse_media_header(buf: bytes) -> dict:
    """Parse the container header of a media payload: sniff the magic and
    extract dimensions / audio params with `struct`. Pure function of the
    bytes; returns ok=False + error instead of raising on anything
    malformed (empty, truncated, unknown magic, corrupt fields)."""
    out = {
        "format": None, "width": None, "height": None, "channels": None,
        "sample_rate": None, "bit_depth": None, "ok": False, "error": None,
    }
    try:
        if buf is None or len(buf) < 2:
            out["error"] = "empty or too short"
            return out
        b = bytes(buf)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is mandatory-first: length(4) type(4) then 13-byte data
            if len(b) < 29 or b[12:16] != b"IHDR":
                out.update(format="png", error="truncated IHDR")
                return out
            w, h = struct.unpack(">II", b[16:24])
            depth, color_type = b[24], b[25]
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            out.update(format="png", width=w, height=h, channels=nch,
                       bit_depth=depth, ok=True)
        elif b[:2] == b"\xff\xd8":
            # JPEG: walk marker segments to the first SOF (C0-CF minus
            # C4/C8/CC which aren't frame headers)
            i = 2
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    depth = b[i + 4]
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    nch = b[i + 9]
                    out.update(format="jpeg", width=w, height=h,
                               channels=nch, bit_depth=depth, ok=True)
                    return out
                i += 2 + seg_len
            out.update(format="jpeg", error="no SOF marker found")
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            if len(b) < 10:
                out.update(format="gif", error="truncated screen descriptor")
                return out
            w, h = struct.unpack("<HH", b[6:10])
            out.update(format="gif", width=w, height=h, channels=3,
                       bit_depth=8, ok=True)
        elif b[:2] == b"BM":
            if len(b) < 26:
                out.update(format="bmp", error="truncated DIB header")
                return out
            w, h = struct.unpack("<ii", b[18:26])
            depth = struct.unpack("<H", b[28:30])[0] if len(b) >= 30 else None
            out.update(format="bmp", width=abs(w), height=abs(h),
                       bit_depth=depth, ok=True)
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # walk chunks to fmt: {audio_fmt, channels, rate, ..., bits}
            i = 12
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                clen = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    nch, rate = struct.unpack("<HI", b[i + 10:i + 16])
                    bits = struct.unpack("<H", b[i + 22:i + 24])[0]
                    out.update(format="wav", channels=nch, sample_rate=rate,
                               bit_depth=bits, ok=True)
                    return out
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            out.update(format="wav", error="no fmt chunk")
        elif b[:2] == b"P5":
            dims = _parse_pgm_header(b)
            if dims is None:
                out.update(format="pgm", error="malformed PGM header")
                return out
            w, h, maxval, _off = dims
            out.update(format="pgm", width=w, height=h, channels=1,
                       bit_depth=8 if maxval < 256 else 16, ok=True)
        else:
            out["error"] = f"unknown magic {b[:4]!r}"
    except Exception as e:  # noqa: BLE001 — poison payloads must not kill the stage
        out["error"] = f"parse error: {e}"
        out["ok"] = False
    return out


def decode_media_headers(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Header-decode stage: mapInPandas over (id, payload) Arrow batches →
    typed header rows (HEADER_SCHEMA). Narrow — no shuffle; each batch is
    parsed where it lives, and only the fixed-width header fields flow
    downstream (the payloads never re-serialize)."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_media_header(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows)
            out.insert(0, "id", pdf["id"].values)
            yield out

    return src.mapInPandas(parse, schema=HEADER_SCHEMA)


# ---------------------------------------------------------------------------
# tier 2: raw-format pixel decode (binary PGM) + dHash perceptual hash
# ---------------------------------------------------------------------------

def _parse_pgm_header(b: bytes):
    """Parse a binary-PGM (P5) header: magic, width, height, maxval as
    whitespace/comment-separated tokens, then one whitespace byte before
    the raster. Returns (w, h, maxval, raster_offset) or None."""
    if b[:2] != b"P5":
        return None
    toks, i, n = [], 2, len(b)
    while len(toks) < 3 and i < n:
        while i < n and b[i:i + 1].isspace():
            i += 1
        if i < n and b[i:i + 1] == b"#":  # comment to EOL
            while i < n and b[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not b[j:j + 1].isspace():
            j += 1
        if j == i:
            return None
        toks.append(b[i:j])
        i = j
    if len(toks) < 3 or i >= n:
        return None
    i += 1  # single whitespace after maxval
    try:
        w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        return None
    return w, h, maxval, i


def decode_pgm(buf: bytes) -> np.ndarray:
    """REAL pixel decode for binary PGM (P5): header parse + numpy
    frombuffer. Raises ValueError on malformed input (callers in batch
    stages catch and mark the row)."""
    b = bytes(buf)
    parsed = _parse_pgm_header(b)
    if parsed is None:
        raise ValueError("not a binary PGM (P5) payload")
    w, h, maxval, off = parsed
    dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    need = w * h * dt.itemsize
    raster = b[off:off + need]
    if len(raster) < need:
        raise ValueError(f"truncated raster: need {need} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=dt).reshape(h, w).astype(np.float64)


def encode_pgm(img: np.ndarray) -> bytes:
    """Inverse of decode_pgm for 8-bit images — fixture/test generation."""
    a = np.asarray(img)
    if a.ndim != 2:
        raise ValueError("PGM is single-channel: expected a 2-D array")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.astype(np.uint8).tobytes()


def mean_pool(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean resize to (out_h, out_w) — the box-filter downscale a
    real thumbnailer uses, in two reduceat passes (no Python loops).
    Handles non-divisible sizes by uneven integer bins."""
    h, w = img.shape
    if h < out_h or w < out_w:
        raise ValueError(f"cannot mean-pool {h}x{w} up to {out_h}x{out_w}")
    row_edges = (np.arange(out_h) * h) // out_h
    col_edges = (np.arange(out_w) * w) // out_w
    sums = np.add.reduceat(np.add.reduceat(img, row_edges, axis=0), col_edges, axis=1)
    row_n = np.diff(np.append(row_edges, h)).reshape(-1, 1)
    col_n = np.diff(np.append(col_edges, w)).reshape(1, -1)
    return sums / (row_n * col_n)


def dhash64(img: np.ndarray) -> int:
    """dHash: area-mean the image to 8x9, take the sign of each horizontal
    gradient (px[r,c+1] > px[r,c]) → 64 bits packed row-major, bit index
    r*8+c. Returns a SIGNED int64 (Spark LongType twin). Invariant to
    uniform brightness/contrast scaling; resize makes it robust to
    rescaling."""
    small = mean_pool(img, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64).ravel()
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    return int(np.int64((bits * weights).sum(dtype=np.uint64)))


def _dhash_stack(stack: np.ndarray) -> np.ndarray:
    """Vectorized dhash64 over a (n, h, w) stack of SAME-SHAPE images:
    one batched reduceat-mean-pool + one batched gradient/packing for the
    whole stack instead of n per-image passes. Bit-identical to dhash64
    per image (same edges, same float math); returns int64[n]."""
    n, h, w = stack.shape
    row_edges = (np.arange(8) * h) // 8
    col_edges = (np.arange(9) * w) // 9
    sums = np.add.reduceat(np.add.reduceat(stack, row_edges, axis=1), col_edges, axis=2)
    row_n = np.diff(np.append(row_edges, h)).reshape(1, -1, 1)
    col_n = np.diff(np.append(col_edges, w)).reshape(1, 1, -1)
    small = sums / (row_n * col_n)
    bits = (small[:, :, 1:] > small[:, :, :-1]).reshape(n, 64).astype(np.uint64)
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    return (bits * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def image_dhash(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    passthrough: list | None = None,
) -> DataFrame:
    """Perceptual-hash stage: mapInPandas over (id, payload) batches →
    (id, [passthrough...], dhash long, ok boolean). Undecodable payloads
    yield ok=False with a null hash instead of failing the stage.
    Narrow — the 8-byte hash (plus any passthrough keys, e.g. a frame
    index) is all that flows to the join/window downstream."""
    extra = list(passthrough or [])
    src = df.select(
        F.col(id_col).alias("id"), *extra, F.col(payload_col).alias("payload")
    )
    extra_schema = "".join(
        f"{c} {src.schema[c].dataType.simpleString()}, " for c in extra
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes: list = [None] * len(pdf)
            oks = [False] * len(pdf)
            # group same-shape images (the video-frame common case) so each
            # group runs ONE vectorized pool+pack pass over an (n, h, w)
            # stack; odd shapes and poison payloads fall back per-row
            groups: dict[tuple, list[tuple[int, bytes, int]]] = {}
            for i, p in enumerate(pdf["payload"]):
                try:
                    b = bytes(p)
                    parsed = _parse_pgm_header(b)
                    if parsed is None:
                        continue
                    w, h, maxval, off = parsed
                    dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
                    if h < 8 or w < 9 or len(b) < off + w * h * dt.itemsize:
                        continue
                    groups.setdefault((w, h, dt.str), []).append((i, b, off))
                except (ValueError, TypeError):
                    continue
            for (w, h, dts), rows in groups.items():
                dt = np.dtype(dts)
                # chunk the stack: one flat (chunk, h, w) float array stays
                # cache-sized; stacking the whole batch at once measured 10x
                # slower (the float64 copy alone thrashes memory bandwidth)
                for s in range(0, len(rows), 2048):
                    chunk = rows[s : s + 2048]
                    stack = np.stack([
                        np.frombuffer(b, dtype=dt, count=w * h, offset=off).reshape(h, w)
                        for _, b, off in chunk
                    ]).astype(np.float64)
                    for (i, _, _), hv in zip(chunk, _dhash_stack(stack)):
                        hashes[i] = int(hv)
                        oks[i] = True
            out = pd.DataFrame({"id": pdf["id"].values})
            for c in extra:
                out[c] = pdf[c].values
            out["dhash"] = pd.array(hashes, dtype="Int64")
            out["ok"] = oks
            yield out

    return src.mapInPandas(
        hash_batch, schema=f"id long, {extra_schema}dhash long, ok boolean"
    )


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: decode → dHash →
    band-blocked hamming self-join (shared plan with simhash text dedup:
    extensions.dedup.hamming_pairs — pigeonhole-exact, no recall gap).
    Undecodable payloads are dropped (ok=False). Scale shape: payload
    bytes never shuffle; only (id, 8-byte hash) enters the join."""
    from epic_pandas_spark.extensions.dedup import hamming_pairs

    hashes = image_dhash(df, id_col, payload_col).filter(F.col("ok")).select("id", "dhash")
    return hamming_pairs(
        hashes.localCheckpoint(eager=False), "dhash", "id",
        max_hamming=max_hamming, n_bands=n_bands,
    )


def decode_wav_pcm(buf: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode for PCM WAV (the uncompressed format — codec-free
    like PGM): walks RIFF chunks to fmt + data and returns
    (sample_rate, float64 samples normalized to [-1, 1], channels
    interleaved-averaged to mono). Raises ValueError on malformed or
    non-PCM payloads."""
    b = bytes(buf)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        clen = struct.unpack("<I", b[i + 4:i + 8])[0]
        body = b[i + 8:i + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, nch, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_fmt != 1:
        raise ValueError(f"only PCM (fmt=1) is codec-free; got fmt={audio_fmt}")
    if bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.float64) / 32768.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if nch > 1:
        n = (len(samples) // nch) * nch
        samples = samples[:n].reshape(-1, nch).mean(axis=1)
    return int(rate), samples


def audio_features(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Audio feature-extraction stage over PCM WAV payloads: mapInPandas →
    (id, sample_rate, n_samples, duration_sec, rms, zero_cross_rate, ok).
    Pure numpy per Arrow batch; undecodable payloads yield ok=False.
    Narrow — payloads stay put, only fixed-width features flow on."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["payload"]:
                try:
                    rate, s = decode_wav_pcm(p)
                    n = len(s)
                    rms = float(np.sqrt(np.mean(s * s))) if n else 0.0
                    zcr = (
                        float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
                        if n > 1 else 0.0
                    )
                    rows.append((rate, n, n / rate if rate else 0.0, rms, zcr, True))
                except (ValueError, TypeError):
                    rows.append((None, None, None, None, None, False))
            out = pd.DataFrame(
                rows,
                columns=["sample_rate", "n_samples", "duration_sec", "rms",
                         "zero_cross_rate", "ok"],
            )
            out.insert(0, "id", pdf["id"].values)
            yield out

    return src.mapInPandas(
        feats,
        schema="id long, sample_rate int, n_samples long, duration_sec double, "
               "rms double, zero_cross_rate double, ok boolean",
    )


def synth_square_wav_udf():
    """Arrow-batched generator of real 16-bit PCM WAV payloads: one second
    of a full-scale-half (amplitude 0.5) square wave at a key-derived
    period — every feature the decode stage computes has a closed form:
    rate = 8000, n = 8000, duration = 1.0, rms = 0.5 exactly, and with
    period p = 2*(10 + key % 13) samples the wave completes n/p full
    cycles, so zero crossings = 2 per cycle = n/(10 + key % 13) - 1
    boundaries... stated precisely: sign flips at every multiple of
    half_p except sample 0 → floor((n-1)/half_p) flips over n-1
    boundaries."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        rate, n = 8000, 8000
        for k in keys:
            half_p = 10 + int(k) % 13
            idx = np.arange(n)
            wave = np.where((idx // half_p) % 2 == 0, 0.5, -0.5)
            pcm = (wave * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
                + b"data" + struct.pack("<I", len(pcm)) + pcm
            out.append(b"RIFF" + struct.pack("<I", len(body)) + body)
        return pd.Series(out)

    return gen


# ---------------------------------------------------------------------------
# tier 3: compressed-pixel decode — optional-dependency gate
# ---------------------------------------------------------------------------

def _try_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Full pixel decode for entropy-coded formats (JPEG/PNG) — needs a
    codec. Upgrades to Pillow when importable; this container doesn't
    ship one, so it raises NotImplementedError here. Header decode and
    raw-format pixel decode (above) do NOT go through this gate."""
    Image = _try_pillow()
    if Image is None:
        raise NotImplementedError(
            "compressed-image pixel decode requires Pillow; not available in "
            "this environment — header decode (decode_media_headers) and raw "
            "PGM pixel decode (decode_pgm/image_dhash) are codec-free"
        )
    import io

    out = []
    for p in payloads:
        img = Image.open(io.BytesIO(p))
        out.append((img.width, img.height, img.mode))
    return pd.DataFrame(out, columns=["width", "height", "mode"])


def fake_feature_extractor(n_features: int = 4):
    """Deterministic stand-in for a decode+embed kernel: maps payload bytes
    to n_features floats (length, first, last, byte-sum mod 256, padded).
    Batch shape, Arrow transfer, and schema behave exactly like a real
    extractor."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.zeros((len(pdf), n_features), dtype=np.float64)
            for i, p in enumerate(pdf["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                vals = [float(len(b)), float(b[0]) if len(b) else 0.0,
                        float(b[-1]) if len(b) else 0.0, float(b.sum() % 256)]
                feats[i, : min(n_features, 4)] = vals[:n_features]
            yield pd.DataFrame({"id": pdf["id"], "features": list(feats)})

    return extract


def extract_features(df: DataFrame, id_col: str = "id", payload_col: str = "payload", n_features: int = 4) -> DataFrame:
    """Feature-extraction stage: mapInPandas over (id, payload) batches →
    (id, features array<double>). Narrow transformation — no shuffle; each
    Arrow batch is processed where it lives."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(
        fake_feature_extractor(n_features), schema="id long, features array<double>"
    )


def sample_frames(df: DataFrame, payload_col: str, frame_size: int, every_n: int) -> DataFrame:
    """Frame-sampling for fixed-frame-size video payloads: take every n-th
    frame_size-byte slice — pure substring expressions over binary, the
    distributed analog of strided frame decoding. Emits (frame_idx,
    frame_bytes) rows via posexplode."""
    n_frames = F.floor(F.length(F.col(payload_col)) / frame_size).cast("int")
    idxs = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))  # short payload => no full frame
    frames = F.transform(
        idxs, lambda i: F.substring(F.col(payload_col), i * frame_size + 1, frame_size)
    )
    return df.select(
        *df.columns, F.posexplode(frames).alias("frame_idx", "frame_bytes")
    )


def scene_changes(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    frame_size: int | None = None,
    max_hamming: int = 3,
    every_n: int = 1,
) -> DataFrame:
    """Video scene-change detection over fixed-frame-size raw payloads:
    slice frames (sample_frames — pure substring expressions), dHash each
    frame through the real PGM decode path, then flag frames whose
    perceptual hash sits more than ``max_hamming`` bits from the previous
    sampled frame's (one lag window per video). Returns
    (id, frame_idx, hamming, is_scene_change) for every frame after the
    first; undecodable frames are dropped (ok=False).

    Scale shape: frame bytes never shuffle — slicing and hashing are
    narrow; only (id, frame_idx, 8-byte hash) enters the per-video
    window, and videos partition independently."""
    if frame_size is None or frame_size <= 0:
        raise ValueError("frame_size (bytes per raw frame) is required")
    frames = sample_frames(
        df.select(F.col(id_col).alias("id"), F.col(payload_col).alias(payload_col)),
        payload_col, frame_size, every_n,
    )
    hashed = image_dhash(
        frames, "id", "frame_bytes", passthrough=["frame_idx"]
    ).filter(F.col("ok"))
    w = Window.partitionBy("id").orderBy("frame_idx")
    prev = F.lag("dhash").over(w)
    ham = F.bit_count(F.col("dhash").bitwiseXOR(prev))
    return (
        hashed.withColumn("hamming", ham)
        .filter(F.col("hamming").isNotNull())
        .select(
            "id", "frame_idx", "hamming",
            (F.col("hamming") > max_hamming).alias("is_scene_change"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic payload generators (fixture side of the oracle queries)
# ---------------------------------------------------------------------------

def _group_pattern_image(g: int, block: int = 4) -> np.ndarray:
    """The deterministic gradient-sign image for group ``g``: dHash of the
    (block-tiled) image equals the seeded 64-bit pattern for g exactly
    (see synth_pgm_payload_udf)."""
    rng = np.random.RandomState(g)
    bits = rng.randint(0, 2, 64)
    img = np.zeros((8, 9), dtype=np.float64)
    img[:, 0] = 128.0
    for r in range(8):
        for c in range(8):
            step = 10.0 if bits[r * 8 + c] else -10.0
            img[r, c + 1] = img[r, c] + step
    return np.kron(img, np.ones((block, block)))


def synth_pgm_payload_udf(n_groups: int = 50, block: int = 4):
    """Arrow-batched generator of REAL binary-PGM payloads whose dHash is a
    closed-form function of a group key: the 64 horizontal-gradient signs
    of the (8 x 9 logical-pixel) image encode the bits of a seeded PRNG
    draw for `key % n_groups`, and each logical pixel is a block x block
    tile so the area-mean resize reconstructs it exactly. Two payloads are
    dHash-identical iff their keys share a group — giving a SQL oracle
    (equi-self-join on key % n_groups) for the full decode→hash→join
    pipeline."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(keys: pd.Series) -> pd.Series:
        # only n_groups distinct images exist — encode each once per batch,
        # not once per key (same lesson as synth_video_payload_udf)
        enc: dict[int, bytes] = {}
        out = []
        for k in keys:
            g = int(k) % n_groups
            b = enc.get(g)
            if b is None:
                b = enc[g] = encode_pgm(_group_pattern_image(g, block))
            out.append(b)
        return pd.Series(out)

    return gen


def synth_video_payload_udf(
    n_groups: int = 50, n_frames: int = 6, cut_at: int = 3, block: int = 4
):
    """Arrow-batched generator of raw "videos": ``n_frames`` fixed-size
    binary-PGM frames concatenated, showing group pattern g for frames
    [0, cut_at) and pattern (g+1) % n_groups from the cut onward — one
    known scene change per video, at frame index ``cut_at``. Every frame
    serializes to the same byte length (fixed dims + maxval), which is
    what makes substring-based frame slicing exact."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(keys: pd.Series) -> pd.Series:
        # only n_groups distinct frame images exist — encode each once per
        # executor, not once per key (measured: the per-key encode was the
        # whole stage's hot spot)
        enc = {g: encode_pgm(_group_pattern_image(g, block)) for g in range(n_groups)}
        out = []
        for k in keys:
            g = int(k) % n_groups
            a, b = enc[g], enc[(g + 1) % n_groups]
            out.append(b"".join([a] * cut_at + [b] * (n_frames - cut_at)))
        return pd.Series(out)

    return gen


def synth_wav_payload_udf():
    """Arrow-batched generator of minimal valid WAV payloads whose fmt
    chunk fields derive from the key (channels = 1 + key%2, rate = 8000 +
    1000*(key%5), bits = 8 + 8*(key%2)) — the header-decode oracle
    recomputes the same fields in SQL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            nch, rate, bits = 1 + k % 2, 8000 + 1000 * (k % 5), 8 + 8 * (k % 2)
            block_align = nch * bits // 8
            fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block_align, block_align, bits)
            data = bytes(8)
            body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
                + b"data" + struct.pack("<I", len(data)) + data
            out.append(b"RIFF" + struct.pack("<I", len(body)) + body)
        return pd.Series(out)

    return gen
