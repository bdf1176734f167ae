"""Autocomplete parity vs the pandas oracle (reference trie ranking:
(Σdf desc, term asc), top-10/prefix, len≥2 — api_autocomplete.cpp:33-55,
105-119) and randomized WAND-vs-TAAT equivalence (SURVEY.md §5 items 2, 7)."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.config import IndexPaths
from nextsearch_api_spark.operators.autocomplete import Suggester
from nextsearch_api_spark.operators.wand import WandEngine
from nextsearch_api_spark.oracle import suggest_oracle


@pytest.fixture(scope="module")
def lex_pdf(spark, tiny_index):
    root, _ = tiny_index
    return spark.read.parquet(IndexPaths(root).lexicon).select(
        "term", "df").toPandas()


def test_suggester_matches_oracle(spark, tiny_index, lex_pdf):
    root, _ = tiny_index
    sug = Suggester(spark.read.parquet(IndexPaths(root).suggest))
    prefixes = ["b", "bu", "buf", "c", "ca", "lo", "ho", "sc", "zz", "x"]
    for p in prefixes:
        got = sug.suggest(p, 10)
        exp = suggest_oracle(lex_pdf, p, 10)
        assert got == exp, f"prefix={p!r}: {got} vs {exp}"


def test_suggest_multiword_echo(spark, tiny_index):
    root, _ = tiny_index
    sug = Suggester(spark.read.parquet(IndexPaths(root).suggest))
    out = sug.suggest("find the Buf", 3)
    assert all(s.startswith("find the ") for s in out)
    # only the last token is completed; completion is case-normalized
    assert all(s.split()[-1].startswith("buf") for s in out)


def test_wand_random_queries_match_taat(tiny_index, lex_pdf):
    root, oracle = tiny_index
    w = WandEngine(root)
    vocab = list(lex_pdf["term"])
    rng = random.Random(7)
    for trial in range(25):
        terms = rng.sample(vocab, rng.randint(1, 5))
        k = rng.choice([1, 3, 10, 50])
        q = " ".join(terms)
        pruned = w.search(q, k, mode="wand")
        full = w.search(q, k, mode="taat")
        assert [r["doc_id"] for r in pruned["results"]] == [
            r["doc_id"] for r in full["results"]
        ], f"trial {trial}: {q!r} k={k}"
        exp = oracle.search(q, k)
        assert [r["doc_id"] for r in full["results"]] == list(exp["doc_id"]), q
