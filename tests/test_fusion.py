"""Hybrid rank fusion: RRF and convex-combination, hand-computed values,
the absent-document convention, weights, and the bounded top-k plan."""

import pytest
from pyspark.sql import functions as F


def _lists(spark):
    # doc 10 is #1 lexically and #2 in the vector list; doc 30 only lexical;
    # doc 40 only vector
    lex = spark.createDataFrame(
        [(10, 1, 5.0), (20, 2, 3.0), (30, 3, 1.0)],
        "doc_id long, rank int, score double")
    vec = spark.createDataFrame(
        [(40, 1, 0.99), (10, 2, 0.98), (20, 3, 0.10)],
        "doc_id long, rank int, score double")
    return lex, vec


def test_rrf_hand_computed(spark):
    from nextsearch_api_spark.operators.fusion import rrf_fuse

    lex, vec = _lists(spark)
    out = {r["doc_id"]: r.asDict()
           for r in rrf_fuse([lex, vec], k=60).collect()}
    assert out[10]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert out[20]["rrf_score"] == round(1 / 62 + 1 / 63, 6)
    assert out[30]["rrf_score"] == round(1 / 63, 6)   # absent from vec: 0
    assert out[40]["rrf_score"] == round(1 / 61, 6)
    assert out[10]["n_lists"] == 2 and out[30]["n_lists"] == 1
    # ranking: 10 > 20 > 40 > 30
    assert [r for r, _ in sorted(
        ((v["rank"], d) for d, v in out.items()))] == [1, 2, 3, 4]
    assert {v["rank"]: d for d, v in out.items()} == {1: 10, 2: 20, 3: 40,
                                                      4: 30}


def test_rrf_weights_and_topk(spark):
    from nextsearch_api_spark.operators.fusion import rrf_fuse

    lex, vec = _lists(spark)
    out = rrf_fuse([lex, vec], k=60, weights=[0.0, 1.0], topk=2).collect()
    # lexical weight 0 → pure vector ranking, truncated to 2
    assert [(r["rank"], r["doc_id"]) for r in out] == [(1, 40), (2, 10)]
    assert out[0]["rrf_score"] == round(1 / 61, 6)

    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([lex, vec], weights=[1.0]).collect()
    with pytest.raises(ValueError, match="k must be positive"):
        rrf_fuse([lex], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_linear_fuse_minmax(spark):
    from nextsearch_api_spark.operators.fusion import linear_fuse

    lex, vec = _lists(spark)
    out = {r["doc_id"]: r.asDict()
           for r in linear_fuse([lex, vec], weights=[0.5, 0.5]).collect()}
    # lex min-max over (5,3,1): 10→1.0, 20→0.5, 30→0.0
    # vec min-max over (.99,.98,.10): 40→1.0, 10→(.98-.1)/.89, 20→0.0
    assert out[10]["fused_score"] == round(0.5 * 1.0
                                           + 0.5 * (0.98 - 0.10) / 0.89, 6)
    assert out[20]["fused_score"] == 0.25
    assert out[30]["fused_score"] == 0.0
    assert out[40]["fused_score"] == 0.5

    # constant-score list: presence is the only signal → everyone 1.0
    flat = lex.withColumn("score", F.lit(7.0))
    o2 = {r["doc_id"]: r["fused_score"]
          for r in linear_fuse([flat], weights=[1.0]).collect()}
    assert o2 == {10: 1.0, 20: 1.0, 30: 1.0}


def test_fusion_topk_plan_is_take_ordered(spark):
    """topk must plan as TakeOrderedAndProject (distributed partial top-k),
    not a single-partition global window sort."""
    from nextsearch_api_spark.operators.fusion import rrf_fuse

    lex, vec = _lists(spark)
    plan = rrf_fuse([lex, vec], topk=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mmr_rerank_hand_computed(spark):
    """Exact-cosine construction: (1,0) vs (3,4) is cos 0.6, vs (0,1) is 0,
    vs (-1,0) is -1. The anti-correlated candidate gets a diversity BONUS
    (regression: a zero-initialized max-sim clamps negative cosines and
    would rank it below the orthogonal one)."""
    from nextsearch_api_spark.operators.fusion import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 1.0, [1.0, 0.0]), (2, 0.9, [3.0, 4.0]),
         (3, 0.5, [0.0, 1.0]), (4, 0.4, [-1.0, 0.0])],
        "doc_id long, score double, embedding array<double>")
    out = [(r["rank"], r["doc_id"], r["mmr_score"])
           for r in mmr_rerank(cand, lam=0.5, k=4)
           .orderBy("rank").collect()]
    # step2: id2 0.45-0.5*0.6=0.15, id3 0.25, id4 0.2-0.5*(-1)=0.7 → id4
    # step3: id2 max-sim 0.6 → 0.15, id3 max-sim 0 → 0.25 → id3
    # step4: id2 max-sim max(0.6,-0.6,0.8)=0.8 → 0.45-0.4=0.05
    assert out == [(1, 1, 0.5), (2, 4, 0.7), (3, 3, 0.25), (4, 2, 0.05)]


def test_mmr_rerank_groups_ties_and_bounds(spark):
    from nextsearch_api_spark.operators.fusion import mmr_rerank

    rows = []
    for g in ("a", "b"):
        rows += [(g, 1, 1.0, [1.0, 0.0]), (g, 2, 1.0, [1.0, 0.0]),
                 (g, 3, 0.5, [0.0, 1.0])]
    cand = spark.createDataFrame(
        rows, "qid string, doc_id long, score double, embedding array<double>")
    out = mmr_rerank(cand, lam=0.5, k=10, group_col="qid").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["qid"], []).append((r["rank"], r["doc_id"]))
    # identical (score, vector) tie → lower doc_id first; k > n returns n;
    # groups re-ranked independently and identically
    want = [(1, 1), (2, 3), (3, 2)]
    assert sorted(by_g["a"]) == want and sorted(by_g["b"]) == want

    import pytest as _pytest
    with _pytest.raises(ValueError, match="lam"):
        mmr_rerank(cand, lam=1.5)
    with _pytest.raises(ValueError, match="k must be positive"):
        mmr_rerank(cand, k=0)
