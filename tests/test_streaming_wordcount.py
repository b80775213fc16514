"""The reference pipeline as a stream: running word counts must equal
the batch wordcount_global after full replay — in one micro-batch and
across forced multi-batch slicing (the streaming state merge must
commute with batch boundaries like the reference's combiner merge)."""

from __future__ import annotations

import glob
import os
import shutil

from mapreduce_4_spark.plans import REGISTRY
from mapreduce_4_spark.streaming import run_stream_to_memory
from mapreduce_4_spark.streaming.wordcount_stream import (
    documents_stream,
    stream_wordcount,
)


def _batch_counts(spark, sf) -> dict[str, int]:
    return {
        r["word"]: r["cnt"]
        for r in REGISTRY["wordcount_global"].builder(spark, sf).collect()
    }


def test_streaming_wordcount_matches_batch(spark, sf_smoke):
    run_stream_to_memory(
        stream_wordcount(documents_stream(spark, sf_smoke)),
        "t_wc_stream", output_mode="complete",
    )
    got = {r["word"]: r["cnt"] for r in spark.table("t_wc_stream").collect()}
    assert got == _batch_counts(spark, sf_smoke)


def test_streaming_wordcount_multi_batch(spark, sf_smoke, tmp_path):
    """Three document slices, one file per micro-batch: the final state
    must be identical to the single-shot run."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):
        docs.filter(docs.doc_id % 3 == i).coalesce(1).write.parquet(
            f"{src}/tmp{i}"
        )
        part = glob.glob(f"{src}/tmp{i}/part-*.parquet")[0]
        shutil.move(part, f"{src}/documents_{i}.parquet")
        shutil.rmtree(f"{src}/tmp{i}")

    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        stream_wordcount(stream), "t_wc_stream_mb", output_mode="complete"
    )
    got = {
        r["word"]: r["cnt"] for r in spark.table("t_wc_stream_mb").collect()
    }
    assert got == _batch_counts(spark, sf_smoke)
