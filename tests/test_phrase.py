"""Exact phrase matching: overlap convention, tokenizer edges, top-k."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pdocs(spark):
    rows = [
        (0, "the quick brown fox"),                   # 1x "quick brown"
        (1, "Quick-Brown, QUICK brown!"),             # 2x, case/punct folded
        (2, "quick quick quick"),                     # overlap: 2x "quick quick"
        (3, "brown quick"),                           # reversed → no match
        (4, "quick"),                                 # shorter than phrase
        (5, ""),                                      # empty
        (6, "a quick2 brown b"),                      # 'quick2' is ONE token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_match_semantics(pdocs):
    from nextsearch_api_spark.operators.phrase import phrase_match

    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_match(pdocs, "Quick  BROWN?").collect()}
    # phrase itself is raw-tokenized: "Quick  BROWN?" == "quick brown"
    assert got == {0: 1, 1: 2}

    overlap = {r["doc_id"]: r["n_occurrences"]
               for r in phrase_match(pdocs, "quick quick").collect()}
    assert overlap == {2: 2}                 # overlapping occurrences count

    kz = {r["doc_id"]: r["n_occurrences"]
          for r in phrase_match(pdocs, "quick brown",
                                keep_zero=True).collect()}
    assert kz == {0: 1, 1: 2, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0}

    # single-token phrase degenerates to term counting
    single = {r["doc_id"]: r["n_occurrences"]
              for r in phrase_match(pdocs, "quick").collect()}
    assert single == {0: 1, 1: 2, 2: 3, 3: 1, 4: 1}

    with pytest.raises(ValueError, match="token"):
        phrase_match(pdocs, "...!?")


def test_phrase_topk_rank_and_plan(pdocs):
    from nextsearch_api_spark.operators.phrase import phrase_topk

    out = [(r["rank"], r["doc_id"], r["n_occurrences"])
           for r in phrase_topk(pdocs, "quick brown", k=2)
           .orderBy("rank").collect()]
    assert out == [(1, 1, 2), (2, 0, 1)]

    plan = phrase_topk(pdocs, "quick brown", k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    with pytest.raises(ValueError, match="k must be positive"):
        phrase_topk(pdocs, "quick brown", k=0)
