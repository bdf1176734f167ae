"""Physical-plan quality gates: the optimizations we claim must be visible in
the explain output — pushed filters on the postings scan, broadcast joins for
query terms, column pruning (no content column in metadata-only plans)."""

import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.config import IndexPaths
from nextsearch_api_spark.operators.query import IndexReader, QuerySpec, batch_search


@pytest.fixture(scope="module")
def plan_env(spark, tiny_index):
    root, _ = tiny_index
    return IndexReader(spark, root)


def _plan(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")  # noqa: SLF001


def test_postings_scan_pushes_term_filter(spark, plan_env):
    df = plan_env.postings().where(F.col("term").isin(["buffer", "cache99"]))
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "In(term" in plan, plan[:2000]


def test_batch_search_uses_broadcast_join(spark, plan_env):
    topk = batch_search(plan_env, [QuerySpec(0, "buffer cache99", 5)])
    plan = _plan(topk)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # top-k is a window row_number bounded filter, not a global sort
    assert "row_number" in plan.lower()


def test_docs_scan_prunes_columns(spark, tiny_index):
    root, _ = tiny_index
    df = spark.read.parquet(IndexPaths(root).docs).select("doc_id", "doc_len")
    plan = _plan(df)
    assert "ReadSchema" in plan
    seg = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "uid" not in seg and "content_sha256" not in seg, seg


def test_suggest_is_windowed_topk(spark, tiny_index):
    root, _ = tiny_index
    from nextsearch_api_spark.operators.autocomplete import build_suggest
    lex = spark.read.parquet(IndexPaths(root).lexicon)
    plan = _plan(build_suggest(lex))
    assert "Window" in plan
