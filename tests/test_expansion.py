"""Semantic query expansion: exact reference constants/semantics
(semantic_embedding.cpp expand/most_similar, api_engine.cpp:411-421)."""

import numpy as np
import pytest

from nextsearch_api_spark.operators.expansion import SemanticExpander


@pytest.fixture()
def expander():
    # hand-built unit vectors: 'buffer' ≈ 'cache' (sim≈0.98), 'buffer' ⊥ 'dog'
    terms = ["buffer", "cache", "stream", "dog"]
    vecs = np.array([
        [1.0, 0.0, 0.1],
        [0.98, 0.05, 0.1],
        [0.7, 0.7, 0.0],
        [0.0, 0.0, 1.0],
    ], dtype=np.float32)
    return SemanticExpander(terms, vecs)


def test_expand_weights_and_ban(expander):
    out = dict(expander.expand(["buffer"]))
    assert out["buffer"] == 1.0                  # original, weight 1.0
    assert "cache" in out                         # near neighbor expanded
    sim = float(expander.vecs[expander.row["cache"]]
                @ expander.vecs[expander.row["buffer"]])
    assert out["cache"] == pytest.approx(min(0.6, 0.6 * sim), rel=1e-6)
    assert "dog" not in out                       # below min_sim 0.55
    # originals are banned from neighbor lists — never re-weighted below 1.0
    out2 = dict(expander.expand(["buffer", "cache"]))
    assert out2["buffer"] == 1.0 and out2["cache"] == 1.0


def test_expand_dedupes_repeats(expander):
    out = expander.expand(["buffer", "buffer"])
    assert len([1 for t, _ in out if t == "buffer"]) == 1


def test_expand_cap_and_order(expander):
    out = expander.expand(["buffer", "stream"], max_total_terms=2)
    assert len(out) == 2
    weights = [w for _, w in out]
    assert weights == sorted(weights, reverse=True)


def test_load_from_text(tmp_path):
    p = tmp_path / "emb.txt"
    p.write_text("3 2\nbuffer 1.0 0.0\ncache 0.9 0.1\nzzz 0.0 1.0\n")
    exp = SemanticExpander.load_from_text(str(p), keep_terms={"buffer", "cache"})
    assert exp.terms == ["buffer", "cache"]
    assert np.allclose(np.linalg.norm(exp.vecs, axis=1), 1.0)


def test_wand_expansion_mode(spark, tiny_index):
    """Expansion ON changes scoring to weighted-dedup mode; same top docs for
    a single unambiguous term, and repeated terms no longer double."""
    from nextsearch_api_spark.operators.wand import WandEngine

    root, oracle = tiny_index
    w = WandEngine(root)
    base = w.search("buffer buffer", 5)
    # fake embeddings: no neighbors above threshold → pure dedup effect
    w.expander = SemanticExpander(["buffer"], np.array([[1.0]], dtype=np.float32))
    dedup = w.search("buffer buffer", 5)
    assert [r["doc_id"] for r in dedup["results"]] == [
        r["doc_id"] for r in w.search("buffer", 5)["results"]
    ]
    # raw mode doubles the score; expansion mode does not
    assert base["results"][0]["score"] == pytest.approx(
        2 * dedup["results"][0]["score"], rel=1e-6)
