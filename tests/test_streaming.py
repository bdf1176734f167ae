"""Structured Streaming ingestion: corpus stream → forward deltas → compacted
index; watermarked event rollup."""

import os

import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.operators.build import build_index
from nextsearch_api_spark.sources.corpus import generate_corpus, write_corpus


def test_stream_ingest_and_compact(spark, tmp_path):
    from nextsearch_api_spark.operators.wand import WandEngine
    from nextsearch_api_spark.streaming.ingest import (
        compact_deltas, stream_corpus_to_forward,
    )

    # base index over 150 docs
    base_dir = str(tmp_path / "base")
    write_corpus(generate_corpus(spark, 150, seed=42), base_dir, partition_by=None)
    root = str(tmp_path / "idx")
    build_index(spark, spark.read.parquet(base_dir), root)
    n_before = WandEngine(root).N

    # stream 60 new docs (different seed → new content) as corpus files
    stream_src = str(tmp_path / "incoming")
    write_corpus(generate_corpus(spark, 60, seed=777), stream_src, partition_by=None)
    deltas = str(tmp_path / "deltas")
    q = stream_corpus_to_forward(
        spark, stream_src, deltas, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    delta_rows = spark.read.parquet(deltas)
    assert delta_rows.count() > 0
    assert delta_rows.agg(F.min("doc_id")).collect()[0][0] >= (1 << 40)

    stats = compact_deltas(spark, root, deltas)
    assert stats["N"] > n_before

    # merged index serves queries over both old and new docs
    w = WandEngine(root)
    assert w.N == stats["N"]
    out = w.search("hotterm", 10)
    ids = [r["doc_id"] for r in out["results"]]
    assert out["found"] > 0 and len(ids) == 10

    # streaming is exactly-once on re-trigger: same checkpoint, no new input
    q2 = stream_corpus_to_forward(
        spark, stream_src, deltas, str(tmp_path / "ckpt"), trigger_once=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(deltas).count() == delta_rows.count()


def test_stream_event_rollup(spark, tmp_path):
    from nextsearch_api_spark.streaming.ingest import stream_event_rollup

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "rollup")
    q = stream_event_rollup(
        spark, os.path.join(src), out, str(tmp_path / "ckpt2"),
        window="1 hour", watermark="0 seconds", trigger_once=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode with availableNow emits windows closed by the watermark;
    # at minimum the schema contract holds and counts are positive
    assert set(got.columns) == {"event_type", "window_start", "n", "sum_value"}
    assert got.where(F.col("n") <= 0).count() == 0
