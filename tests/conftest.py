import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("nextsearch-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """200-doc deterministic corpus (FIXTURES.md 'tiny')."""
    from nextsearch_api_spark.sources.corpus import generate_corpus

    return generate_corpus(spark, 200, seed=42, partitions=4).cache()


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    """Built index over the tiny corpus + matching oracle."""
    import pandas as pd

    from nextsearch_api_spark.operators.build import assign_doc_ids, build_index
    from nextsearch_api_spark.oracle import OracleIndex

    root = str(tmp_path_factory.mktemp("index"))
    build_index(spark, tiny_corpus, root)

    ids_pdf = assign_doc_ids(tiny_corpus).select("doc_id", "content").toPandas()
    oracle = OracleIndex.build(ids_pdf, content_col="content")
    return root, oracle
