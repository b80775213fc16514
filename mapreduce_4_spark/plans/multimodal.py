"""Multimodal queries: binary payload metadata (oracle-checked) and the
stubbed decode/frame-sample pipelines (rows-only; plumbing tested in
tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.multimodal import (
    attach_fake_image,
    decode_features,
    sample_frames,
)
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "multimodal_image_meta",
    oracle="""
        SELECT doc_id,
               octet_length(CAST(text AS BLOB)) AS byte_len,
               md5(text) AS media_md5,
               CAST(64 + doc_id % 512 AS INTEGER) AS width,
               CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS height
        FROM documents
    """,
    tags=("multimodal",),
    description="binary payload metadata: byte length, content hash, typed "
                "width/height from the metadata struct",
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = attach_fake_image(docs)
    return media.select(
        "doc_id",
        F.length("media").cast("long").alias("byte_len"),
        F.md5("media").alias("media_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "multimodal_decode_features",
    oracle=None,  # decode stub (blake2b) is not SQL; batch plumbing tested separately
    tags=("multimodal", "udf"),
    description="mapInPandas feature extraction over binary media "
                "(deterministic stub decode; real codec slots into the same "
                "batch fn). Feature vector serialized to CSV at the registry "
                "boundary; the array API lives in operators/multimodal.py.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = decode_features(attach_fake_image(docs), decode_mode="fake")
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_bytes",
        F.size("features").cast("long").alias("dim"),
        F.concat_ws(
            "|", F.transform("features", lambda x: x.cast("string"))
        ).alias("features_csv"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS nb
            FROM documents
        )
        SELECT d.doc_id,
               CAST(t.i AS INTEGER) AS frame_idx,
               md5(lower(substring(d.hx, CAST(t.i * 128 + 1 AS BIGINT), 128)))
                   AS frame_md5
        FROM d, LATERAL (SELECT unnest(range(0, (d.nb + 63) // 64)) AS i) t
    """,
    tags=("multimodal", "udf", "flatmap"),
    description="frame sampling: 1 media row -> k frame rows via mapInPandas "
                "(64-byte windows, hex-canonical md5 per frame)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return sample_frames(attach_fake_image(docs), every_n_bytes=64)


@register(
    "multimodal_resize",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) + 3 AS BIGINT) // 4 AS byte_len,
               CAST(greatest(1, (64 + doc_id % 512) // 4) AS INTEGER) AS width,
               CAST(greatest(1, (64 + (doc_id * 7) % 512) // 4) AS INTEGER) AS height
        FROM documents
    """,
    tags=("multimodal", "udf"),
    description="resize stage (stride-4 stub): payload and dimensions shrink "
                "by the scale factor; metadata contract oracle-checked",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    resized = resize_media(attach_fake_image(docs), scale=4)
    return resized.select(
        "doc_id",
        F.length("media").cast("long").alias("byte_len"),
        "width",
        "height",
    )


@register(
    "binary_files_meta",
    oracle=None,  # filesystem metadata has no DuckDB view
    tags=("multimodal", "scan"),
    description="binaryFile source: one row per file with path/length/bytes",
)
def binary_files_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.sources.binary import read_binary_dir

    files = read_binary_dir(spark, sf_dir, glob="*.parquet")
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "length",
        F.md5("content").alias("content_md5"),
    )
