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
    # The stub decode is exact byte arithmetic (md5 blocks -> LE uint32
    # lanes -> top 24 bits scaled by 2^-24; operators/multimodal.py
    # _fake_features), so DuckDB can replay it from the same payload
    # bytes. The boundary serializes each float32 feature back to its
    # underlying 24-bit integer (f * 2^24 — exact, the value IS a
    # dyadic rational with a 24-bit numerator), sidestepping
    # engine-specific float->string formatting entirely.
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   md5('0' || text) || md5('1' || text) AS hx,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        )
        SELECT doc_id,
               CAST(64 + doc_id % 512 AS INTEGER) AS width,
               CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS height,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(8 AS BIGINT) AS dim,
               array_to_string(
                   list_transform(range(0, 8), g -> CAST(
                       CAST('0x' || substr(hx, g * 8 + 7, 2)
                                 || substr(hx, g * 8 + 5, 2)
                                 || substr(hx, g * 8 + 3, 2)
                                 || substr(hx, g * 8 + 1, 2) AS BIGINT) >> 8
                       AS VARCHAR)),
                   '|') AS features_q24_csv
        FROM d
    """,
    tags=("multimodal", "udf"),
    description="mapInPandas feature extraction over binary media "
                "(deterministic stub decode; real codec slots into the same "
                "batch fn). Features serialized losslessly as 24-bit "
                "integers at the registry boundary; the float array API "
                "lives in operators/multimodal.py.",
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
            "|",
            F.transform(
                "features",
                lambda x: (x.cast("double") * F.lit(float(1 << 24)))
                .cast("long").cast("string"),
            ),
        ).alias("features_q24_csv"),
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


#: The one path an oracle SQL string cannot receive as a parameter: the
#: driver's correctness pass runs every oracle at a fixed scale factor
#: (TESTDATA.md: "t2 correctness (duckdb oracle) uses sf0.01"), so the
#: read_blob glob pins it — honoring the same SPARK_GRAFT_ORACLE_DIR
#: override the test conftest uses, so a relocated fixture keeps the
#: Spark scan and the oracle glob pointed at the SAME directory.
import os as _os

_ORACLE_SF_DIR = _os.environ.get(
    "SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01"
)


@register(
    "binary_files_meta",
    # DuckDB's read_blob() sees the same files the binaryFile source
    # scans. md5 in DuckDB 1.0 is VARCHAR-only, so both engines hash the
    # lowercase-hex canonical form of the bytes (the same convention
    # multimodal_frame_sample established for frame payloads).
    oracle=f"""
        SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
               CAST(size AS BIGINT) AS length,
               md5(lower(hex(content))) AS content_md5
        FROM read_blob('{_ORACLE_SF_DIR}/*.parquet')
    """,
    tags=("multimodal", "scan"),
    description="binaryFile source: one row per file with path/length and a "
                "hex-canonical content hash",
)
def binary_files_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.sources.binary import read_binary_dir

    files = read_binary_dir(spark, sf_dir, glob="*.parquet")
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "length",
        F.md5(F.lower(F.hex("content")).cast("binary")).alias("content_md5"),
    )
