"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched featurizers.

The 100 TB pattern: media bytes live in a ``content BINARY`` column
(or object-store URIs for very large blobs), typed metadata
(``media_type``, dimensions, durations) travels alongside so queries
can filter/partition WITHOUT touching bytes — Catalyst prunes the
binary column away unless a featurizer actually needs it.

Decode is backend-dependent (PIL/ffmpeg are not in this container), so
the codec layer is pluggable: the default ``deterministic_stub``
backend produces reproducible pseudo-features from the raw bytes (real
plumbing — schema, batching, partitioning — with a fake decoder);
``strict`` raises NotImplementedError to mark where a real decoder
plugs in.
"""

from __future__ import annotations

import hashlib
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
    if backend not in ("deterministic_stub", "strict"):
        raise ValueError(f"unknown media backend {backend!r}")
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + ", feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "strict":
                raise NotImplementedError(
                    "real media decode requires an image/audio backend "
                    "(PIL/librosa/ffmpeg) — not available in this "
                    "environment; use backend='deterministic_stub'"
                )
            pdf = pdf.copy()
            pdf["feature"] = [
                _stub_feature(bytes(b)) if b is not None else None
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
