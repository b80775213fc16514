"""Multimodal-column operators: typed binary payloads + metadata, with
decode / feature-extraction / frame-sampling as Arrow-batched
``mapInPandas`` stages.

Container constraint: no image/audio codecs are installed here, so the
actual pixel/sample decode is STUBBED — ``decode_mode="real"`` raises
NotImplementedError after the import-try, and ``decode_mode="fake"``
substitutes a deterministic byte-level transform. Everything around the
stub is real and tested: the binary column handling, the metadata
struct, the mapInPandas batch iteration, the output schema, and the
partition-parallel execution — on a cluster with codecs, only the body
of ``_decode_one`` changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

#: schema of the decoded-feature output — fixed contract for downstream
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def attach_fake_image(docs: DataFrame) -> DataFrame:
    """Give each document an opaque binary payload + typed metadata —
    the canonical multimodal row layout: (id, media: binary,
    meta: struct<width,height,format>). Payload bytes are the UTF-8 text
    (a deterministic stand-in for real image bytes)."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("media"),
        F.struct(
            (F.lit(64) + F.col("doc_id") % 512).cast("int").alias("width"),
            (F.lit(64) + (F.col("doc_id") * 7) % 512).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor, defined so an
    external SQL oracle can replay it byte-for-byte: concatenate
    ``md5(str(j) + payload)`` blocks until ``dim`` little-endian uint32
    lanes are covered, keep each lane's TOP 24 bits (``u >> 8`` fits a
    float32 mantissa exactly), and scale by 2^-24 (a power of two, so
    the division is exact too). Every feature value is therefore an
    exact dyadic rational — stable across processes, runs, AND engines
    (the DuckDB oracle recomputes the same integers from the md5 hex)."""
    n_blocks = (dim * 4 + 15) // 16
    digest = b"".join(
        hashlib.md5(str(j).encode() + payload).digest() for j in range(n_blocks)
    )
    lanes = np.frombuffer(digest[: dim * 4], dtype="<u4")
    return (lanes >> 8).astype(np.float32) / np.float32(2**24)


def _pil_features(payload: bytes, dim: int) -> np.ndarray:
    """Real decode path: PIL-decoded pixels -> dim-bucket grayscale
    histogram (unit-normalized). Undecodable payloads yield zeros — at
    100 TB a corrupt image must degrade, not kill the job."""
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload)) as img:
            gray = np.asarray(img.convert("L"), dtype=np.float32)
    except Exception:
        return np.zeros(dim, dtype=np.float32)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    total = hist.sum()
    return (hist / total).astype(np.float32) if total else np.zeros(dim, np.float32)


def decode_features(media_df: DataFrame, decode_mode: str = "fake",
                    dim: int = 8) -> DataFrame:
    """media rows -> per-item feature vectors via mapInPandas.

    Arrow-batched: each Python call sees a pandas batch, not a row. The
    SAME batch function serves both modes — only the per-payload decoder
    differs:

    - ``"fake"`` (default): deterministic digest stand-in, runs anywhere.
    - ``"pil"`` (alias ``"real"``): actual image decode via PIL, grayscale
      histogram features. Requires PIL on the cluster image; absence is
      reported at plan-build time, not inside executors.
    """
    if decode_mode in ("pil", "real"):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # codec not in the container
            raise NotImplementedError(
                "image decode requires PIL; install codecs on the "
                "cluster image and re-run with decode_mode='pil'"
            ) from exc
        decoder = _pil_features
    elif decode_mode == "fake":
        decoder = _fake_features
    else:
        raise ValueError(
            f"decode_mode must be 'pil', 'real' or 'fake', got {decode_mode!r}"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(payload if payload is not None else b"", dim)
                for payload in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "n_bytes": pdf["media"].map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "features": feats,
                }
            )

    return media_df.mapInPandas(decode_batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("scale", IntegerType()),
    ]
)


def resize_media(media_df: DataFrame, scale: int = 4) -> DataFrame:
    """Resize stub: byte-stride downsampling stands in for pixel
    resampling (a real codec swaps the slice for an interpolator). The
    metadata contract is the real part: output dimensions shrink by
    ``scale`` and the payload shrinks proportionally, batch-wise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media": [
                        (b or b"")[::scale] for b in pdf["media"]
                    ],
                    "width": pdf["meta"].map(
                        lambda m: max(1, m["width"] // scale)
                    ).astype("int32"),
                    "height": pdf["meta"].map(
                        lambda m: max(1, m["height"] // scale)
                    ).astype("int32"),
                    "scale": scale,
                }
            )

    return media_df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stub for video-shaped payloads: one output row per
    sampled 'frame' (a byte-window stand-in), content-fingerprinted. Real
    frame extraction would swap the windowing for a codec call; the explode
    shape (1 row in -> k rows out via yielded batches) is the real part.

    The fingerprint is md5 over the window's lowercase-hex encoding (not
    the raw bytes): hex-first is engine-portable, so the whole stage is
    oracle-checkable in ANSI SQL (md5(lower(substring(hex(payload), ...)))).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = payload or b""
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    window = payload[off:off + every_n_bytes]
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_md5.append(hashlib.md5(window.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media_df.mapInPandas(frames, FRAME_SCHEMA)
