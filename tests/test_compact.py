"""Chunk compaction: fragmented-term merge must preserve the logical index
and search results exactly."""

import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.config import BuildConfig, IndexPaths
from nextsearch_api_spark.operators.build import build_index
from nextsearch_api_spark.operators.compact import compact_postings
from nextsearch_api_spark.operators.wand import WandEngine
from nextsearch_api_spark.sources.corpus import generate_corpus, read_corpus, write_corpus


def test_compact_preserves_search(spark, tmp_path):
    p = str(tmp_path / "c")
    write_corpus(generate_corpus(spark, 400, seed=42), p, partition_by=None)
    corpus = read_corpus(spark, p)
    root = str(tmp_path / "idx")
    # many explicit segments over a tiny corpus → fragmented chunks (the
    # condition compaction exists for)
    build_index(spark, corpus, root, BuildConfig(segment_partitions=12))

    before = spark.read.parquet(IndexPaths(root).postings).count()
    df_sum_before = spark.read.parquet(IndexPaths(root).lexicon).agg(
        F.sum("df")).collect()[0][0]
    w1 = WandEngine(root)
    queries = ["hotterm", "buffer", "load config", "cache99 flush hotterm score"]
    res_before = [w1.search(q, 10) for q in queries]

    out = compact_postings(spark, root)
    assert out["swapped"] and out["fragmented_terms"] > 0
    after = spark.read.parquet(IndexPaths(root).postings).count()
    assert after < before  # fewer, fuller chunks

    # lexicon df mass preserved
    lex = spark.read.parquet(IndexPaths(root).lexicon)
    assert lex.agg(F.sum("df")).collect()[0][0] == df_sum_before

    w2 = WandEngine(root)
    for q, r1 in zip(queries, res_before):
        r2 = w2.search(q, 10)
        assert [x["doc_id"] for x in r2["results"]] == [
            x["doc_id"] for x in r1["results"]
        ], q
        assert r2["found"] == r1["found"]
