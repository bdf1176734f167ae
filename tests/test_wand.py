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
