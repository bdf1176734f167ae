"""Block-max WAND correctness: pruned top-k must be rank-identical to the
exhaustive path, the golden oracle, and the Spark batch path (SURVEY.md M5)."""

import numpy as np
import pytest

from nextsearch_api_spark.operators.wand import WandEngine
from tests.test_build_query import QUERIES


@pytest.fixture(scope="session")
def wand(tiny_index):
    root, _ = tiny_index
    return WandEngine(root)


def test_wand_matches_oracle(wand, tiny_index):
    _, oracle = tiny_index
    for qid, q, k in QUERIES:
        got = wand.search(q, k)
        exp = oracle.search(q, k)
        got_ids = [r["doc_id"] for r in got["results"]]
        assert got_ids == list(exp["doc_id"]), f"q={q!r}"
        got_s = np.array([r["score"] for r in got["results"]])
        exp_s = exp["score"].to_numpy(dtype=np.float64)
        if len(got_s):
            assert np.allclose(got_s, exp_s, rtol=2e-5), f"q={q!r}"


def test_wand_pruned_equals_exhaustive(wand):
    for _, q, k in QUERIES:
        pruned = wand.search(q, k, prune=True)
        full = wand.search(q, k, prune=False)
        assert [r["doc_id"] for r in pruned["results"]] == [
            r["doc_id"] for r in full["results"]
        ], q
        ps = [r["score"] for r in pruned["results"]]
        fs = [r["score"] for r in full["results"]]
        assert np.allclose(ps, fs, rtol=1e-9), q
        # exhaustive found is exact
        assert full["found"] == wand.found_count(q), q


def test_wand_small_k_prunes_hot_term(wand, tiny_index):
    """k=1 on the super-hot term must not decode fewer-or-wrong results."""
    _, oracle = tiny_index
    got = wand.search("hotterm", 1)
    exp = oracle.search("hotterm", 1)
    assert [r["doc_id"] for r in got["results"]] == list(exp["doc_id"])


def test_wand_oov_and_empty(wand):
    assert wand.search("zzzznotaterm", 10)["results"] == []
    assert wand.search("the a an", 10)["found"] == 0


@pytest.fixture(scope="session")
def multichunk_wand(spark, tiny_corpus, tmp_path_factory):
    """Index with chunk_size=8 → every common term spans many chunks with
    varying block maxes. Regression surface for the r1 ADVICE soundness bug:
    pivoting on current-chunk maxes let skip_to jump over higher-impact later
    chunks, silently dropping true top-k docs."""
    from nextsearch_api_spark.config import BuildConfig
    from nextsearch_api_spark.operators.build import build_index

    root = str(tmp_path_factory.mktemp("index_mc"))
    build_index(spark, tiny_corpus, root, cfg=BuildConfig(chunk_size=8))
    return WandEngine(root)


def test_segment_chunks_disjoint_over_partitioned_corpus(
    spark, tiny_corpus, tmp_path_factory
):
    """Building over a lang-partitioned corpus (files NOT in doc order) must
    still produce per-term disjoint chunk ranges — the seg-break invariant.
    Regression: without seg breaks, id-bucket hash placement made ids files
    overlap in doc range and WAND returned wrong top-k / crashed."""
    from nextsearch_api_spark.operators.build import build_index
    from nextsearch_api_spark.sources.corpus import read_corpus, write_corpus

    base = tmp_path_factory.mktemp("langpart")
    write_corpus(tiny_corpus, str(base / "corpus"))  # partitionBy("lang")
    corpus = read_corpus(spark, str(base / "corpus"))
    root = str(base / "index")
    build_index(spark, corpus, root)

    eng = WandEngine(root)  # __init__ raises on overlapping chunk ranges
    hot = sorted(eng._df, key=lambda t: -eng._df[t])[0]
    pruned = eng.search(f"{hot} bufferrank", 5, mode="wand")
    full = eng.search(f"{hot} bufferrank", 5, mode="taat")
    assert ([r["doc_id"] for r in pruned["results"]]
            == [r["doc_id"] for r in full["results"]])


def test_wand_multichunk_parity_exhaustive(multichunk_wand):
    """WAND over many small chunks must stay rank-identical to TAAT for every
    query × k — the property the unsound pivot violated."""
    eng = multichunk_wand
    vocab = sorted(eng._df, key=lambda t: -eng._df[t])
    hot = vocab[:4]
    mid = vocab[len(vocab) // 2:len(vocab) // 2 + 4]
    rare = vocab[-4:]
    queries = [
        " ".join(hot), " ".join(mid), " ".join(rare),
        f"{hot[0]} {rare[0]}", f"{hot[0]} {mid[0]} {rare[1]}",
        f"{hot[1]} {hot[1]} {mid[1]}",  # repeated term (weight 2)
        f"{mid[2]} {rare[2]} {hot[2]} {mid[3]}",
    ]
    for q in queries:
        for k in (1, 3, 10):
            pruned = eng.search(q, k, mode="wand")
            full = eng.search(q, k, mode="taat")
            assert (
                [r["doc_id"] for r in pruned["results"]]
                == [r["doc_id"] for r in full["results"]]
            ), f"q={q!r} k={k}"
            ps = [r["score"] for r in pruned["results"]]
            fs = [r["score"] for r in full["results"]]
            assert np.allclose(ps, fs, rtol=1e-9), f"q={q!r} k={k}"
