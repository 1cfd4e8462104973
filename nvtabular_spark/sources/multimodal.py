"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested (schemas, Arrow batch shape,
``mapInPandas`` partition flow, metadata propagation). Codec status:

* image — REAL pure-numpy decode for uncompressed 24-bit BMP
  (:func:`decode_bmp`), PNG (stdlib zlib, all five scanline filters)
  and baseline + progressive JPEG (:mod:`.jpeg` — stream-driven
  Huffman + IDCT, 4:4:4/4:2:0/4:2:2, restart markers, SOF2 spectral
  selection + successive approximation; encoders provided for
  fixtures), with real grid-pool feature extraction and resize.
  Remaining exotic modes (arithmetic/lossless JPEG, formats needing
  PIL) raise ``NotImplementedError`` in strict mode or fall back to a
  deterministic fake otherwise.
* audio — REAL pure-numpy decode for PCM-16 WAV (:func:`decode_wav`)
  with real RMS-energy frame features.
* video — MJPEG AVI is decoded FOR REAL (:mod:`.avi` RIFF walker +
  the native JPEG codec per frame; writer provided for fixtures).
  Other containers/codecs genuinely require ffmpeg/av and stay stubbed
  behind the same ``mapInPandas`` flow (deterministic fake frames, or
  NotImplementedError in strict mode).

At 100 TB: binary payloads stay in parquet/Iceberg binary columns;
``mapInPandas`` streams Arrow record batches through the extractor so
no executor ever holds a partition's blobs fully decoded; pair with
``spark.sql.files.maxPartitionBytes`` sized to blob width.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

IMAGE_META_SCHEMA = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("format", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("features", ArrayType(FloatType())),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def attach_fake_binary(df: DataFrame, id_col: str, payload_bytes: int = 64,
                       out_col: str = "payload") -> DataFrame:
    """Deterministic binary column for testing the multimodal plumbing
    (sha2-derived bytes, repeatable across runs/partitionings)."""
    hex_str = F.sha2(F.col(id_col).cast("string"), 256)
    repeated = F.substring(F.repeat(hex_str, (payload_bytes // 32) + 1),
                           1, payload_bytes * 2)
    return df.withColumn(out_col, F.unhex(repeated).cast(BinaryType()))


# ---------------------------------------------------------------------------
# real pure-numpy codecs (no external image/audio libraries required)
# ---------------------------------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (test fixtures). ``arr``:
    (H, W, 3) uint8 RGB."""
    h, w, _ = arr.shape
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * h
    header = (b"BM" + (54 + img_size).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + b"\x00" * 24)
    rows = []
    for y in range(h - 1, -1, -1):          # BMP stores bottom-up
        bgr = arr[y, :, ::-1].tobytes()     # and uses BGR order
        rows.append(bgr + b"\x00" * pad)
    return header + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of an uncompressed 24-bit BMP → (H, W, 3)
    uint8 RGB. Raises ValueError on any other BMP flavor."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(got bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]                  # BGR → RGB
    return rgb[::-1] if flip else rgb


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (the real op behind the
    multimodal 'resize' capability)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def image_grid_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Real feature extraction: mean RGB per grid cell → 3*grid² floats
    in [0, 1] (average-pool 'embedding'; swap for a vision model in
    production — batch shape identical)."""
    cell = resize_image(img.astype("float32") / 255.0,
                        grid * 8, grid * 8)
    pooled = cell.reshape(grid, 8, grid, 8, 3).mean(axis=(1, 3))
    return pooled.reshape(-1).astype("float32")


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib
    return (len(body).to_bytes(4, "big") + tag + body
            + zlib.crc32(tag + body).to_bytes(4, "big"))


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit RGB, filter 0, no interlace) — test
    fixtures. ``arr``: (H, W, 3) uint8."""
    import zlib
    h, w, _ = arr.shape
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))  # bit depth 8, color type 2 (RGB)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy + stdlib-zlib PNG decode: 8-bit greyscale/RGB/RGBA,
    no interlace, all five scanline filters (None/Sub/Up/Average/
    Paeth). Returns (H, W, C) uint8. Raises ValueError on other PNG
    flavors (16-bit, palette, interlaced)."""
    import zlib
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color}, "
                         f"interlace={interlace})")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint16)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride,
                             offset=y * (stride + 1) + 1).astype(np.uint16)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint16)
        if ftype == 0:                       # None
            out[y] = line
        elif ftype == 2:                     # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:                     # Sub (prefix dep along row)
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            out[y] = cur
        elif ftype == 3:                     # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = cur
        elif ftype == 4:                     # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter {ftype}")
    return out.astype(np.uint8).reshape(h, w, channels)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal PCM-16 mono WAV writer (test fixtures)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + sample_rate.to_bytes(4, "little")
            + byte_rate.to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)


def decode_wav(payload: bytes):
    """Pure-numpy decode of a PCM-16 mono/stereo WAV →
    (samples float32 in [-1, 1] shaped (n, channels), sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM-16 WAV supported (format="
                         f"{audio_format}, bits={bits})")
    pcm = np.frombuffer(data, dtype="<i2")
    pcm = pcm[:len(pcm) // channels * channels].reshape(-1, channels)
    return pcm.astype("float32") / 32767.0, sample_rate


def audio_energy_features(samples: np.ndarray, n_frames: int = 16):
    """Real DSP features: per-window RMS energy over the (mono-mixed)
    signal → n_frames floats."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if len(mono) == 0:
        return np.zeros(n_frames, dtype="float32")
    win = max(1, len(mono) // n_frames)
    frames = mono[:win * n_frames]
    if len(frames) < win * n_frames:
        frames = np.pad(frames, (0, win * n_frames - len(frames)))
    rms = np.sqrt((frames.reshape(n_frames, win) ** 2).mean(axis=1))
    return rms.astype("float32")


def _fake_decode(payload: bytes, feature_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode + embed: bytes →
    fixed-dim float features. Replace with (e.g.) PIL + a vision model
    in production — signature and batch shape stay identical."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2 ** 31)
    rng = np.random.RandomState(seed)
    return rng.standard_normal(feature_dim).astype("float32")


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           binary_col: str = "payload",
                           feature_dim: int = 16, grid: int = 4,
                           strict: bool = False) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    BMP payloads are decoded FOR REAL (pure numpy) and featurized with
    grid average-pooling (``3*grid²`` floats). Other formats (JPEG/PNG
    need PIL, absent here): ``strict=True`` raises NotImplementedError
    at the codec boundary; otherwise a deterministic byte-derived fake
    keeps the distributed path exercised."""
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("features", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ])

    def to_rgb(img):
        if img.shape[2] == 1:
            return np.repeat(img, 3, axis=2)
        if img.shape[2] == 4:
            return img[:, :, :3]
        return img[:, :, :3]

    def decode_one(b):
        if b is None:
            return None
        b = bytes(b)
        try:
            if b[:2] == b"BM":
                return image_grid_features(decode_bmp(b), grid)
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                return image_grid_features(to_rgb(decode_png(b)), grid)
            if b[:3] == b"\xff\xd8\xff":
                from .jpeg import decode_jpeg
                return image_grid_features(decode_jpeg(b), grid)
        # truncated/corrupt streams surface as struct.error / IndexError
        # / KeyError / EOFError from the codecs, and progressive JPEG as
        # NotImplementedError — ALL must hit the non-strict fallback,
        # not kill the whole mapInPandas task
        except (ValueError, NotImplementedError, struct.error,
                IndexError, KeyError, EOFError) as e:
            if strict:
                # a recognized-format payload that failed to decode is a
                # MALFORMED input, not an unsupported format — chain the
                # codec's real error so the diagnostic survives
                raise NotImplementedError(
                    "strict image decode failed for a recognized format "
                    f"({type(e).__name__}: {e}) — payload is corrupt or "
                    "uses an unsupported coding process") from e
            return _fake_decode(b, feature_dim)
        if strict:
            raise NotImplementedError(
                "exotic image decode requires PIL/torchvision — not "
                "available in this environment (BMP, PNG, baseline and "
                "progressive JPEG decode natively)")
        return _fake_decode(b, feature_dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [None if f is None else f.tolist() for f in feats],
                "n_bytes": [0 if b is None else len(b)
                            for b in pdf[binary_col]],
            })

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def extract_audio_features(df: DataFrame, id_col: str = "doc_id",
                           binary_col: str = "payload",
                           n_frames: int = 16,
                           strict: bool = False) -> DataFrame:
    """WAV (PCM-16) payloads decoded FOR REAL (pure numpy) → per-window
    RMS energy features + sample rate. Non-WAV: strict raises, else
    deterministic fake."""
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("features", ArrayType(FloatType())),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, rates, counts = [], [], []
            for b in pdf[binary_col]:
                if b is None:
                    feats.append(None); rates.append(None); counts.append(0)
                    continue
                b = bytes(b)
                if b[:4] == b"RIFF":
                    samples, sr = decode_wav(b)
                    feats.append(audio_energy_features(samples,
                                                       n_frames).tolist())
                    rates.append(sr)
                    counts.append(int(samples.shape[0]))
                elif strict:
                    raise NotImplementedError(
                        "non-WAV audio decode requires soundfile/librosa "
                        "— not available in this environment")
                else:
                    feats.append(_fake_decode(b, n_frames).tolist())
                    rates.append(0)
                    counts.append(0)
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats,
                                "sample_rate": rates, "n_samples": counts})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, id_col: str = "doc_id",
                        binary_col: str = "payload", every_n: int = 10,
                        strict: bool = False) -> DataFrame:
    """Frame sampling: one output row per sampled frame index.

    MJPEG AVI payloads are parsed FOR REAL (:mod:`.avi` RIFF walker):
    ``frame_bytes`` carries the sampled frame's complete JFIF payload,
    decodable with the native JPEG codec. Other containers/codecs
    genuinely need ffmpeg: ``strict=True`` raises NotImplementedError,
    otherwise a deterministic fake keeps the plumbing flowing."""
    from .avi import avi_mjpeg_frames, is_avi

    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ])

    def emit_fake(b, i, ids, idxs, frames):
        n_frames = 0 if b is None else max(1, len(b) // 16)
        for fi in range(0, n_frames, every_n):
            ids.append(i)
            idxs.append(fi)
            frames.append(None if b is None
                          else bytes(b)[fi % len(b):fi % len(b) + 4])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                b = None if b is None else bytes(b)
                if b is not None and is_avi(b):
                    try:
                        fs = avi_mjpeg_frames(b)
                    except (NotImplementedError, ValueError,
                            struct.error) as e:
                        if strict:
                            raise NotImplementedError(str(e)) from e
                        emit_fake(b, i, ids, idxs, frames)
                        continue
                    for fi in range(0, len(fs), every_n):
                        ids.append(i)
                        idxs.append(fi)
                        frames.append(fs[fi])
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-AVI video decode requires ffmpeg/av — only "
                        "MJPEG AVI is natively supported")
                emit_fake(b, i, ids, idxs, frames)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_bytes": frames})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)
