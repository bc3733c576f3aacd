"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata and
implements decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Codec status (no image/audio libs in this container):
* REAL pure-numpy decoders for uncompressed formats — BMP (24bpp) and
  PPM (P6) images, PCM WAV audio — exercised end-to-end by the
  synthetic media table, which emits genuine BMP/WAV blobs;
* compressed formats (PNG/JPEG/MP3/MP4) raise ``NotImplementedError``
  with a clear message — swap in PIL/ffmpeg in production, nothing
  else changes;
* ``fake=True`` keeps the deterministic hash-derived fallback for
  plumbing tests that don't care about pixels.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _fake_u64(data: pd.Series) -> np.ndarray:
    """Deterministic per-blob pseudo-hash (first 8 bytes xor length)."""
    out = np.empty(len(data), dtype=np.uint64)
    for i, b in enumerate(data):
        head = int.from_bytes((bytes(b)[:8] or b"\0").ljust(8, b"\0"), "little")
        out[i] = np.uint64(head) ^ np.uint64(len(b))
    return out


# ------------------------------------------------------ real codecs (numpy)
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    bgr = pixels[:, :, ::-1]  # BMP stores BGR, bottom-up
    for r in range(h - 1, -1, -1):
        rows.append(bgr[r].tobytes() + b"\0" * pad)
    return header + dib + b"".join(rows)


def decode_bmp(blob: bytes) -> tuple[int, int, int, float]:
    """24bpp uncompressed BMP -> (width, height, channels, mean_pixel)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    h_abs = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h_abs, offset=offset)
    rows = rows.reshape(h_abs, stride)[:, :row_bytes]
    return w, h_abs, 3, float(rows.mean())


def decode_ppm(blob: bytes) -> tuple[int, int, int, float]:
    """Binary PPM (P6) -> (width, height, channels, mean_pixel)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval>\n with comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while blob[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, 3, float(px.mean())


def decode_image(blob: bytes) -> tuple[int, int, int, float]:
    """Dispatch on magic bytes; uncompressed formats decode in numpy."""
    b = bytes(blob)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] == b"P6":
        return decode_ppm(b)
    raise NotImplementedError(
        f"image format {b[:4]!r} requires an external codec (PIL/opencv) — "
        "only uncompressed BMP/PPM decode in-container"
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM WAV bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(blob: bytes) -> tuple[int, int, int, float]:
    """PCM WAV -> (sample_rate, n_samples, channels, rms)."""
    b = bytes(blob)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits = 12, None, None, None
    samples = None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", b, body)
            bits = struct.unpack_from("<H", b, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV decodes in-container")
        elif cid == b"data":
            samples = np.frombuffer(b, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if samples.size else 0.0
    return rate, samples.size // channels, channels, rms


# ------------------------------------------------------------ image decode
IMAGE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """binary -> (width, height, channels, mean_pixel) per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                h = _fake_u64(pdf["data"])
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": (16 + (h % np.uint64(1024))).astype(np.int32),
                        "height": (16 + ((h >> np.uint64(10)) % np.uint64(1024))).astype(np.int32),
                        "channels": np.full(len(pdf), 3, dtype=np.int32),
                        "mean_pixel": ((h >> np.uint64(20)) % np.uint64(256)).astype(np.float64),
                    }
                )
                continue
            rows = [decode_image(b) for b in pdf["data"]]
            out = pd.DataFrame(rows, columns=["width", "height", "channels", "mean_pixel"])
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            out["width"] = out["width"].astype(np.int32)
            out["height"] = out["height"].astype(np.int32)
            out["channels"] = out["channels"].astype(np.int32)
            yield out

    return df.where(F.col("modality") == "image").select("media_id", "data").mapInPandas(
        run, IMAGE_INFO_SCHEMA
    )


def _bmp_pixels(blob: bytes) -> np.ndarray:
    """24bpp BMP -> (h, w, 3) uint8 RGB array (top-down)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    h_abs = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h_abs, offset=offset)
    px = rows.reshape(h_abs, stride)[:, :row_bytes].reshape(h_abs, w, 3)
    if h > 0:  # bottom-up storage
        px = px[::-1]
    return px[:, :, ::-1]  # BGR -> RGB


def resize_image(blob: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of an uncompressed BMP -> BMP bytes."""
    px = _bmp_pixels(bytes(blob))
    h, w = px.shape[:2]
    yi = np.clip((np.arange(out_h) + 0.5) * h / out_h, 0, h - 1).astype(np.int64)
    xi = np.clip((np.arange(out_w) + 0.5) * w / out_w, 0, w - 1).astype(np.int64)
    return encode_bmp(np.ascontiguousarray(px[yi][:, xi]))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """image binary -> resized image binary (fixed target box).

    Real path: pure-numpy nearest-neighbor over decoded BMP pixels,
    re-encoded as BMP (compressed inputs would raise — swap the codec
    for PIL in production, the Spark plumbing is unchanged).  Fake
    path: deterministic hash-derived bytes of the right advertised
    dimensions, for plumbing tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                h = _fake_u64(pdf["data"])
                blobs = [
                    bytes(np.random.default_rng(int(s)).integers(0, 256, 64, dtype=np.uint8))
                    for s in h
                ]
            else:
                blobs = [resize_image(b, width, height) for b in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "data": blobs,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                }
            )

    return df.where(F.col("modality") == "image").select("media_id", "data").mapInPandas(
        run, RESIZED_SCHEMA
    )


AUDIO_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(df: DataFrame) -> DataFrame:
    """binary -> (sample_rate, n_samples, channels, rms) per PCM WAV."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav(b) for b in pdf["data"]]
            out = pd.DataFrame(rows, columns=["sample_rate", "n_samples", "channels", "rms"])
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            out["sample_rate"] = out["sample_rate"].astype(np.int32)
            out["n_samples"] = out["n_samples"].astype(np.int64)
            out["channels"] = out["channels"].astype(np.int32)
            yield out

    return df.where(F.col("modality") == "audio").select("media_id", "data").mapInPandas(
        run, AUDIO_INFO_SCHEMA
    )


# ------------------------------------------------------------ features
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 64, fake: bool = False) -> DataFrame:
    """binary -> dense feature vector.

    Real path: decode the image (BMP/PPM) and pool pixel statistics
    into a deterministic unit vector (a stand-in embedding with real
    decode semantics — a model forward pass in production).  Fake
    path: hash-derived unit vector.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.empty((len(pdf), dim), dtype=np.float32)
            if fake:
                h = _fake_u64(pdf["data"])
                for i, seed in enumerate(h):
                    mat[i] = np.random.default_rng(int(seed)).standard_normal(dim)
            else:
                for i, b in enumerate(pdf["data"]):
                    w, hh, c, mean = decode_image(b)
                    mat[i] = np.random.default_rng(
                        abs(hash((w, hh, c, round(mean, 3)))) % (1 << 63)
                    ).standard_normal(dim)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": list(mat / norms)}
            )

    src = df
    if not fake and "modality" in df.columns:
        # the real path decodes images; other modalities would raise
        src = df.where(F.col("modality") == "image")
    return src.select("media_id", "data").mapInPandas(run, FEATURE_SCHEMA)


# ------------------------------------------------------ video (AVI) codec
def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> uncompressed ('DIB ') AVI.

    Minimal RIFF layout: LIST hdrl (avih + LIST strl(strh 'vids'/'DIB ',
    strf BITMAPINFOHEADER)) then LIST movi with one '00db' device-
    independent-bitmap chunk per frame (BGR, bottom-up, 4-byte row
    stride — the same pixel layout as the BMP codec above)."""
    n, h, w, _ = frames.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    frame_size = (row_bytes + pad) * h

    def dib(px: np.ndarray) -> bytes:
        bgr = px[:, :, ::-1]
        return b"".join(
            bgr[r].tobytes() + b"\0" * pad for r in range(h - 1, -1, -1)
        )

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    strl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))) + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(chunk(b"00db", dib(frames[i])) for i in range(n))
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(blob: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Uncompressed AVI -> (width, height, [frame (h, w, 3) RGB]).
    Compressed streams (anything but biCompression=0 / 24bpp) raise
    ``NotImplementedError`` — swap in ffmpeg in production."""
    b = bytes(blob)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    topdown = False
    stream_type = None  # fccType of the most recent strh (vids/auds/...)
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, topdown, stream_type
        while pos + 8 <= end:
            cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"strh":
                stream_type = b[body : body + 4]
            elif cid == b"strf" and stream_type == b"vids":
                # a strf's layout depends on its stream: only the video
                # stream's is a BITMAPINFOHEADER (an audio strf is a
                # WAVEFORMATEX and must not be read as pixel format)
                bpp = struct.unpack_from("<H", b, body + 14)[0]
                comp = struct.unpack_from("<I", b, body + 16)[0]
                if bpp != 24 or comp != 0:
                    raise NotImplementedError(
                        f"AVI bpp={bpp} compression={comp} needs ffmpeg — "
                        "only uncompressed 24bpp DIB decodes in-container"
                    )
                w, h = struct.unpack_from("<ii", b, body + 4)
                topdown = h < 0  # negative biHeight = top-down rows
                h = abs(h)
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before video stream format")
                row_bytes = w * 3
                stride = row_bytes + ((-row_bytes) % 4)
                if size < stride * h:
                    # undersized 00db/00dc chunk: reading count=stride*h
                    # would silently consume adjacent container bytes
                    # as pixel data
                    raise ValueError(
                        f"corrupt AVI: frame chunk holds {size} bytes, "
                        f"format requires {stride * h}"
                    )
                rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=body)
                px = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
                if not topdown:
                    px = px[::-1]  # bottom-up storage
                frames.append(px[:, :, ::-1].copy())  # BGR -> RGB
            pos = body + size + (size & 1)

    walk(12, len(b))
    if w is None:
        raise ValueError("no video stream format (strf) found")
    return w, h, frames


# ------------------------------------------------------------ frames
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_total", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """video binary -> up to n evenly-spaced REAL frames, each
    re-encoded as a standalone BMP (decodable by ``decode_images`` —
    the video -> frames -> image pipeline composes).  One row per
    frame, ``frame_idx`` = source frame index.  Real path: the
    uncompressed-AVI codec above (compressed containers raise with a
    clear ffmpeg message).  ``fake=True`` keeps the deterministic
    byte-slice stand-in for opaque-blob plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, frames = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(blob)
                if fake:
                    step = max(len(blob) // n_frames, 1)
                    for j in range(n_frames):
                        ids.append(mid)
                        idxs.append(j)
                        totals.append(n_frames)
                        frames.append(blob[j * step : (j + 1) * step] or b"\0")
                    continue
                try:
                    _, _, px_frames = decode_avi(blob)
                except ValueError as e:
                    if "not a RIFF/AVI" not in str(e):
                        raise  # corrupt AVI structure — not a codec gap
                    # non-RIFF container (MP4/MKV/opaque bytes): refuse
                    # with the same honest external-codec message as
                    # compressed streams, not a cryptic mid-job error
                    raise NotImplementedError(
                        f"video container {bytes(blob)[:4]!r} requires ffmpeg — "
                        "only uncompressed RIFF/AVI decodes in-container "
                        "(use fake=True for opaque-blob plumbing)"
                    ) from e
                m = len(px_frames)
                take = np.unique(
                    np.linspace(0, m - 1, num=min(n_frames, m)).round().astype(int)
                )
                for j in take:
                    ids.append(mid)
                    idxs.append(int(j))
                    totals.append(m)
                    frames.append(encode_bmp(px_frames[j]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "n_total": np.array(totals, dtype=np.int32),
                    "frame": frames,
                }
            )

    return df.where(F.col("modality") == "video").select("media_id", "data").mapInPandas(
        run, FRAME_SCHEMA
    )


# ------------------------------------------------------------ synthetic
def synthetic_media(spark, rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL blobs: genuine 24bpp BMP
    images, PCM WAV audio, and uncompressed-DIB AVI video — every
    modality decodable by the pure-numpy codecs above."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                kind = int(mid) % 3
                if kind == 0:
                    w, h = int(rng.integers(4, 24)), int(rng.integers(4, 24))
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    out.append((int(mid), "image", encode_bmp(px), {"fmt": "bmp"}))
                elif kind == 1:
                    n = int(rng.integers(64, 512))
                    samples = rng.integers(-(1 << 14), 1 << 14, size=n).astype(np.int16)
                    out.append((int(mid), "audio", encode_wav(samples), {"fmt": "wav"}))
                else:
                    n, w, h = (
                        int(rng.integers(3, 10)),
                        int(rng.integers(4, 16)),
                        int(rng.integers(4, 16)),
                    )
                    px = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
                    out.append((int(mid), "video", encode_avi(px), {"fmt": "avi"}))
            yield pd.DataFrame(out, columns=["media_id", "modality", "data", "meta"])

    return spark.range(rows).mapInPandas(gen, MEDIA_SCHEMA)
