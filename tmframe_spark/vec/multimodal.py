"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The decode step is REAL for the container formats whose headers are
parseable with pure stdlib (no media wheels ship in this environment):

- PNG  — signature + IHDR width/height (big-endian, offsets 16..24)
- GIF  — GIF87a/GIF89a logical screen descriptor (little-endian u16)
- BMP  — BITMAPINFOHEADER width/height (little-endian i32, height may be
         negative for top-down rows)
- WAV  — RIFF/WAVE chunk walk: fmt (channels, sample rate, block align) +
         data size -> n_frames = sample frames
- AVI  — RIFF/'AVI ' hdrl/avih: dwTotalFrames, dwWidth, dwHeight

Anything else falls back to the clearly-marked deterministic stub (replace
with PIL/libvips/ffmpeg in production). Spark-side shape: mapInPandas over
(media_id, kind, payload binary) Arrow batches; per-item header parse (real
decoders are per-item anyway), vectorized feature math.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

#: unknown formats fall back to a deterministic fake (honestly labeled);
#: set False to hard-fail on undecodable payloads instead.
DETERMINISTIC_FAKE = True

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# header sniffing / parsing (the real decode step)
# ---------------------------------------------------------------------------


def sniff_media(payload: bytes) -> tuple[str, int, int, int]:
    """(fmt, width, height, n_frames) from container headers, or
    ('unknown', ...stub...) when no known magic matches."""
    p = payload
    if p[:8] == _PNG_SIG and len(p) >= 24:
        w, h = struct.unpack_from(">II", p, 16)
        return "png", w, h, 1
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack_from("<HH", p, 6)
        return "gif", w, h, 1
    if p[:2] == b"BM" and len(p) >= 26:
        w, h = struct.unpack_from("<ii", p, 18)
        return "bmp", w, abs(h), 1
    if p[:4] == b"RIFF" and len(p) >= 12:
        kind4 = p[8:12]
        if kind4 == b"WAVE":
            return _parse_wav(p)
        if kind4 == b"AVI ":
            return _parse_avi(p)
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError(
            f"media decode: unknown container magic {p[:8]!r}"
        )
    w, h, f = _decode_stub_dims(p)
    return "unknown", w, h, f


def _parse_wav(p: bytes) -> tuple[str, int, int, int]:
    """Chunk walk: channels/sample-rate from fmt, frames from data size.
    Audio has no raster dims -> width = height = 0."""
    o, block_align, frames = 12, None, 0
    while o + 8 <= len(p):
        cid, sz = p[o : o + 4], struct.unpack_from("<I", p, o + 4)[0]
        if cid == b"fmt " and sz >= 16:
            _fmt, _ch, _sr, _bps, block_align, _bits = struct.unpack_from(
                "<HHIIHH", p, o + 8
            )
        elif cid == b"data" and block_align:
            frames = sz // block_align
        o += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    return "wav", 0, 0, frames


def _parse_avi(p: bytes) -> tuple[str, int, int, int]:
    """Find the avih main header: dwTotalFrames @+16, dwWidth/dwHeight
    @+32/+36 of the avih payload."""
    o = 12
    while o + 8 <= len(p):
        cid, sz = p[o : o + 4], struct.unpack_from("<I", p, o + 4)[0]
        if cid == b"LIST":
            o += 12  # descend into the list (skip its type fourcc)
            continue
        if cid == b"avih" and sz >= 40:
            frames = struct.unpack_from("<I", p, o + 8 + 16)[0]
            w, h = struct.unpack_from("<II", p, o + 8 + 32)
            return "avi", w, h, frames
        o += 8 + sz + (sz & 1)
    return "avi", 0, 0, 0


def _decode_stub_dims(payload: bytes) -> tuple[int, int, int]:
    """STUB for unknown formats: deterministic dims from the payload bytes.
    Replace with a real decoder in production."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return int(h[:4].sum()) % 1024 + 16, int(h[4:8].sum()) % 1024 + 16, 1


def _feature8(payload: bytes) -> np.ndarray:
    """8-dim content feature: mean of each 1/8th of the (first 64) bytes."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(
        np.float32
    )
    return h.reshape(8, 8).mean(axis=1) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Input schema: (media_id long, kind string, payload binary). Output:
    FEATURE_SCHEMA. Arrow moves the binary batches; the header parse is
    per-item (as any real decoder is), the feature math vectorized."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload or b"")
                fmt, w, h, nf = sniff_media(b)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "fmt": fmt,
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "feature": _feature8(b).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic REAL-container fixtures (pure stdlib builders)
# ---------------------------------------------------------------------------


def build_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        _PNG_SIG
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + struct.pack(">I", 0)
        + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )


def build_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def build_bmp(w: int, h: int) -> bytes:
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info


def build_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    bits = 16
    block = channels * bits // 8
    # deterministic tiny body: a byte ramp, enough for data-size parsing
    data = bytes((i * 7) & 0xFF for i in range(n_samples * block))
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, sample_rate * block, block, bits
    )
    dat = b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(dat)) + b"WAVE" + fmt + dat


def build_avi(w: int, h: int, n_frames: int) -> bytes:
    avih = struct.pack(
        "<IIIIIIIIII4I", 33367, 0, 0, 0x10, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


#: deterministic per-id dimension formulas shared with the DuckDB oracle
def media_dims(media_id: int) -> tuple[str, int, int, int]:
    """(kind, width, height, n_frames) for the synthetic fixture: images
    rotate png/gif/bmp; audio is WAV (w=h=0, frames = sample count); video
    is AVI."""
    k = media_id % 3
    w = (media_id * 7) % 1000 + 16
    h = (media_id * 13) % 1000 + 16
    if k == 0:
        return "image", w, h, 1
    if k == 1:
        return "audio", 0, 0, (media_id % 50 + 1) * 100
    return "video", w, h, media_id % 240 + 1


def synth_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic REAL-container media table: payloads are valid PNG /
    GIF / BMP / WAV / AVI headers built with stdlib struct, dims given by
    ``media_dims`` (which the SQL oracle restates arithmetically)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind, w, h, nf = media_dims(mid)
                if kind == "image":
                    builder = (build_png, build_gif, build_bmp)[(mid // 3) % 3]
                    payload = builder(w, h)
                elif kind == "audio":
                    payload = build_wav(8000, 1, nf)
                else:
                    payload = build_avi(w, h, nf)
                rows.append({"media_id": mid, "kind": kind, "payload": payload})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(fn, schema)
