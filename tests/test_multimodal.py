"""Multimodal plumbing tests: schema contract, determinism, batch shape,
and the real-codec stub gate (SURVEY.md task spec: stub the decode, make
the Spark-side plumbing real and tested)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    attach_fake_image,
    decode_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    from mapreduce_4_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    return attach_fake_image(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["media"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct<width:int,height:int")


def test_decode_features_contract(spark, media):
    out = decode_features(media, decode_mode="fake")
    assert out.schema == FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] > 0


def test_decode_deterministic_across_runs(spark, media):
    a = {r["doc_id"]: r["features"] for r in decode_features(media).collect()}
    b = {r["doc_id"]: r["features"] for r in decode_features(media).collect()}
    assert a == b


def test_decode_parallelism_invariant(spark, media):
    """Repartitioning must not change results — batch boundaries are an
    execution detail, not a semantic one."""
    one = {r["doc_id"]: r["features"]
           for r in decode_features(media.repartition(1)).collect()}
    many = {r["doc_id"]: r["features"]
            for r in decode_features(media.repartition(16)).collect()}
    assert one == many


def test_real_decode_raises_without_pil(media):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed; the pil path is exercised below")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_features(media, decode_mode="real")
    with pytest.raises(ValueError):
        decode_features(media, decode_mode="bogus")


def test_pil_decode_path(spark, media):
    """With PIL present: same batch fn, real decode. Text payloads are
    not valid images, so every row degrades to the zero vector rather
    than failing the job — the corrupt-input contract."""
    pytest.importorskip("PIL")
    out = decode_features(media, decode_mode="pil").collect()
    assert len(out) == media.count()
    for r in out[:10]:
        assert len(r["features"]) == 8
        assert all(v == 0.0 for v in r["features"])


def test_frame_sample_explodes(spark, media):
    frames = sample_frames(media, every_n_bytes=64)
    per_doc = dict(frames.groupBy("doc_id").count().collect())
    lens = dict(media.select("doc_id", F.length("media").alias("n")).collect())
    for doc_id, n in list(lens.items())[:20]:
        expected = (n + 63) // 64
        assert per_doc[doc_id] == expected
    # frame indices are dense 0..k-1
    idx = frames.filter(F.col("doc_id") == list(lens)[0]).select("frame_idx").collect()
    assert sorted(r["frame_idx"] for r in idx) == list(range(len(idx)))


def test_resize_media_contract(spark, media):
    from mapreduce_4_spark.operators.multimodal import resize_media

    out = resize_media(media, scale=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    orig = {r["doc_id"]: r for r in media.collect()}
    assert rows.keys() == orig.keys()
    for doc_id, r in list(rows.items())[:20]:
        o = orig[doc_id]
        assert r["width"] == max(1, o["meta"]["width"] // 4)
        assert r["height"] == max(1, o["meta"]["height"] // 4)
        expected_len = (len(o["media"]) + 3) // 4  # stride-4 slice length
        assert len(r["media"]) == expected_len
        assert bytes(r["media"]) == bytes(o["media"])[::4]


def test_binary_file_source(spark, sf_smoke):
    from mapreduce_4_spark.sources.binary import read_binary_dir

    files = read_binary_dir(spark, sf_smoke, glob="*.parquet")
    names = {r["path"].rsplit("/", 1)[-1] for r in files.select("path").collect()}
    assert "documents.parquet" in names and "lineitem.parquet" in names
    r = files.filter(F.col("path").endswith("documents.parquet")).first()
    assert r["length"] == len(r["content"])
