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


def test_long_prefix_falls_back_to_lexicon_scan(spark):
    """Prefixes beyond the table's 12-char explosion bound must still
    complete (the reference trie is unbounded) when a df lookup is given."""
    from nextsearch_api_spark.operators.autocomplete import build_suggest

    lex = spark.createDataFrame(
        [("supercalifragilistic", 50), ("supercalifornia", 80),
         ("supper", 10), ("buffer", 99)],
        "term string, df long",
    )
    sug_df = build_suggest(lex)
    dfmap = {r["term"]: r["df"] for r in lex.collect()}
    s = Suggester(sug_df, df_lookup=dfmap)
    # 13-char prefix: not in the table, served by the exact scan
    assert s.suggest("supercalif", 5) == ["supercalifornia", "supercalifragilistic"]
    assert s.suggest("supercalifrag", 5) == ["supercalifragilistic"]
    assert s.suggest("supercalifragilistic", 5) == ["supercalifragilistic"]
    assert s.suggest("supercalifragilisticz", 5) == []
    # without the lookup the old behavior (empty) remains
    s2 = Suggester(sug_df)
    assert s2.suggest("supercalifrag", 5) == []
    # short prefixes still use the precomputed table
    assert s.suggest("sup", 5) == ["supercalifornia", "supercalifragilistic", "supper"]
