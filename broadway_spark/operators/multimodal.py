"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched featurizers.

The 100 TB pattern: media bytes live in a ``content BINARY`` column
(or object-store URIs for very large blobs), typed metadata
(``media_type``, dimensions, durations) travels alongside so queries
can filter/partition WITHOUT touching bytes — Catalyst prunes the
binary column away unless a featurizer actually needs it.

Decode backends, pluggable per call:

- ``builtin`` — a REAL decoder with zero dependencies: pure-Python
  PPM/PGM image parsing (netpbm binary formats) and stdlib ``wave``
  WAV audio parsing, producing real features (dimensions, per-channel
  means, duration, RMS). Unrecognized bytes → null feature.
- ``deterministic_stub`` — reproducible pseudo-features from the raw
  bytes; stands in for heavyweight codecs (JPEG/PNG/MP4 need
  PIL/ffmpeg, not present in this container).
- ``strict`` — raises NotImplementedError at the exact seam where a
  heavyweight codec would plug in.

The Spark plumbing (schema, Arrow batch shape, partition parallelism)
is identical across backends — that is what scales; the codec is a
per-batch pure function.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_SUFFIX = (
    "media_type string, byte_len int, content_md5 string, feature array<float>"
)

FEATURE_DIM = 8


def attach_media(
    df: DataFrame, content_col: str, media_type: str
) -> DataFrame:
    """Normalize a binary payload column into the media envelope:
    (content BINARY, media_type, byte_len, content_md5). Metadata is
    computed JVM-side; bytes are untouched."""
    c = F.col(content_col)
    return df.withColumn("media_type", F.lit(media_type)).withColumn(
        "byte_len", F.octet_length(c)
    ).withColumn("content_md5", F.md5(c))


def _stub_feature(data: bytes) -> list[float]:
    """Deterministic fake 'decode + embed': FEATURE_DIM floats derived
    from the md5 digest. Stands in for a real image/audio featurizer."""
    digest = hashlib.md5(data).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def _parse_netpbm(data: bytes):
    """Decode binary PGM (P5) / PPM (P6): returns (w, h, channels,
    maxval, pixels bytes) or None. Pure Python — netpbm is a public,
    trivially parseable format, which makes the decode path REAL
    without any imaging library."""
    if not (data.startswith(b"P5") or data.startswith(b"P6")):
        return None
    channels = 3 if data[:2] == b"P6" else 1
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed; pixel data follows the single
    # whitespace after maxval.
    tokens, i, n = [], 2, len(data)
    while len(tokens) < 3 and i < n:
        c = data[i : i + 1]
        if c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    if len(tokens) < 3:
        return None
    i += 1  # the single whitespace delimiter before pixel data
    try:
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    except ValueError:
        return None
    pixels = data[i : i + w * h * channels]
    if len(pixels) < w * h * channels or maxval > 255:
        return None
    return w, h, channels, maxval, pixels


def _builtin_feature(data: bytes) -> list[float] | None:
    """Real decode → FEATURE_DIM floats.

    images (PGM/PPM): [1, width, height, channels, mean_c0, mean_c1,
    mean_c2, maxval]; audio (WAV, 16-bit PCM): [2, n_channels,
    sample_rate, n_frames, duration_s, rms, 0, 0]. None for formats
    this dependency-free backend can't parse.
    """
    img = _parse_netpbm(data)
    if img is not None:
        w, h, channels, maxval, pixels = img
        means = [0.0, 0.0, 0.0]
        npix = w * h
        if npix:
            sums = [0, 0, 0]
            for idx, b in enumerate(pixels):
                sums[idx % channels] += b
            means = [
                (sums[c] / npix if c < channels else 0.0) for c in range(3)
            ]
        return [1.0, float(w), float(h), float(channels)] + [
            round(m, 4) for m in means
        ] + [float(maxval)]
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(data), "rb") as wf:
                nch = wf.getnchannels()
                rate = wf.getframerate()
                nframes = wf.getnframes()
                width = wf.getsampwidth()
                frames = wf.readframes(nframes)
            if width == 2 and frames:
                samples = struct.unpack(f"<{len(frames) // 2}h", frames)
                rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
            else:
                rms = 0.0
            return [
                2.0,
                float(nch),
                float(rate),
                float(nframes),
                round(nframes / rate, 6) if rate else 0.0,
                round(rms, 4),
                0.0,
                0.0,
            ]
        except (wave.Error, struct.error, EOFError):
            return None
    return None


def featurize(
    df: DataFrame,
    content_col: str,
    backend: str = "deterministic_stub",
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Real plumbing, pluggable codec: with backend='strict' this raises
    where PIL/librosa/ffmpeg would be called — the Spark side (schema,
    Arrow batch shape, partition parallelism) is identical either way.
    Output schema: input columns + feature array<float>.
    """
    if backend not in ("deterministic_stub", "strict", "builtin"):
        raise ValueError(f"unknown media backend {backend!r}")
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + ", feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "strict":
                raise NotImplementedError(
                    "heavyweight media decode (JPEG/PNG/MP4) requires "
                    "PIL/librosa/ffmpeg — not available in this "
                    "environment; use backend='builtin' (PPM/PGM/WAV) "
                    "or 'deterministic_stub'"
                )
            decode = (
                _builtin_feature if backend == "builtin" else _stub_feature
            )
            pdf = pdf.copy()
            pdf["feature"] = [
                decode(bytes(b)) if b is not None else None
                for b in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_ddl)


def _resize_netpbm(data: bytes, out_w: int, out_h: int) -> bytes | None:
    """REAL nearest-neighbor resize for PGM/PPM: decode, sample the
    source grid, re-encode. Returns None for non-netpbm bytes (a
    heavyweight codec would plug in at the same seam)."""
    img = _parse_netpbm(data)
    if img is None or out_w <= 0 or out_h <= 0:
        return None
    w, h, channels, maxval, pixels = img
    if w == 0 or h == 0:
        return None
    rows = bytearray()
    for y in range(out_h):
        sy = min(h - 1, (y * h) // out_h)
        for x in range(out_w):
            sx = min(w - 1, (x * w) // out_w)
            off = (sy * w + sx) * channels
            rows += pixels[off : off + channels]
    magic = b"P6" if channels == 3 else b"P5"
    header = magic + f"\n{out_w} {out_h}\n{maxval}\n".encode()
    return header + bytes(rows)


def resize(
    df: DataFrame,
    content_col: str,
    width: int,
    height: int,
    out_col: str = "content_resized",
) -> DataFrame:
    """Distributed image resize over mapInPandas (Arrow batches): the
    builtin nearest-neighbor path for netpbm; unparseable media → null.
    Output = input columns + ``out_col`` BINARY — downstream
    ``featurize``/``attach_media`` compose on the resized bytes.
    """
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + f", {out_col} binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                _resize_netpbm(bytes(b), width, height)
                if b is not None
                else None
                for b in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_ddl)


def frame_sample_plan(
    df: DataFrame, content_col: str, every_n: int = 10
) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-media rows into frame
    rows (frame_idx) whose decode is deferred to ``featurize``. The
    expansion itself is pure Spark (no Python), so a 100 TB video table
    fans out to frame tasks without decoding on the driver.
    Uses byte_len as the duration proxy in stub mode.
    """
    n_frames = (F.col("byte_len") / F.lit(every_n)).cast("int")
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
    )


def resize_plan(
    df: DataFrame, w_col: str, h_col: str, target: int = 224
) -> DataFrame:
    """Aspect-preserving resize *plan* into a target×target letterbox:
    the integer-exact geometry every image-preprocessing stage
    computes before touching pixels (out dims via truncating division
    on the long side, padding = the leftover box). Pure codegen
    integer arithmetic — the planner runs on metadata columns only,
    so a 100 TB image table plans its resizes without reading one
    pixel byte; the actual resample is the featurizer's per-batch
    concern. Adds out_w/out_h/pad_x/pad_y."""
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    t = F.lit(int(target)).cast("long")
    out_w = F.when(w >= h, t).otherwise(F.expr(
        f"CAST({w_col} AS BIGINT) * {int(target)}"
        f" DIV CAST({h_col} AS BIGINT)"
    ))
    out_h = F.when(w >= h, F.expr(
        f"CAST({h_col} AS BIGINT) * {int(target)}"
        f" DIV CAST({w_col} AS BIGINT)"
    )).otherwise(t)
    return (
        df.withColumn("out_w", out_w.cast("long"))
        .withColumn("out_h", out_h.cast("long"))
        .withColumn("pad_x", (t - F.col("out_w")).cast("long"))
        .withColumn("pad_y", (t - F.col("out_h")).cast("long"))
    )
