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


def test_lazy_suggester_matches_collected(spark, tiny_index, lex_pdf):
    """LazySuggester (pyarrow row-group-pruned lookups) must answer exactly
    like the collected-dict Suggester on every prefix present in the table,
    on misses, on multiword echo, and on the long-prefix lexicon fallback."""
    from nextsearch_api_spark.operators.autocomplete import LazySuggester

    root, _ = tiny_index
    path = IndexPaths(root).suggest
    dfmap = dict(zip(lex_pdf["term"], lex_pdf["df"].astype(int)))
    eager = Suggester(spark.read.parquet(path), df_lookup=dfmap)
    lazy = LazySuggester(path, df_lookup=dfmap)

    prefixes = set(
        r["prefix"]
        for r in spark.read.parquet(path).select("prefix").distinct().collect()
    )
    for p in sorted(prefixes) + ["zz", "x", "qqqqq"]:
        assert lazy.suggest(p, 10) == eager.suggest(p, 10), p
    assert lazy.suggest("find the Buf", 3) == eager.suggest("find the Buf", 3)
    long_tok = max(dfmap, key=len)
    if len(long_tok) > lazy.max_prefix_len:
        assert lazy.suggest(long_tok, 5) == eager.suggest(long_tok, 5)


def test_lazy_suggester_reads_bounded_bytes(spark, tmp_path):
    """VERDICT r5 next #1 'done' criterion: with the serving layout
    (prefix-range-partitioned, sorted, small row groups) a lookup must read
    O(1)-ish bytes — a couple of row groups, a small fraction of the table —
    and a repeated lookup must hit the LRU and read nothing."""
    from nextsearch_api_spark.operators.autocomplete import (
        LazySuggester, build_suggest)

    # a synthetic lexicon big enough to span MANY row groups at a 64 KiB
    # parquet block size: 26*26*30 terms -> ~60k suggest rows
    terms = [f"{a}{b}term{i:03d}"
             for a in "abcdefghijklmnopqrstuvwxyz"
             for b in "abcdefghijklmnopqrstuvwxyz"
             for i in range(30)]
    lex = spark.createDataFrame(
        [(t, (hash(t) % 97) + 1) for t in terms], "term string, df long")
    sug = build_suggest(lex).persist()
    out = str(tmp_path / "suggest")
    (sug.repartitionByRange(4, "prefix").sortWithinPartitions("prefix", "rnk")
        .write.mode("overwrite").option("parquet.block.size", 64 << 10)
        .parquet(out))
    total_rows = sug.count()
    sug.unpersist()

    lazy = LazySuggester(out)
    n_rg = len(lazy._ranges) + len(lazy._unranged)
    assert n_rg >= 8, f"layout produced too few row groups to test ({n_rg})"

    for tok in ["ab", "mz", "zz", "qa"]:
        before = lazy.io_counters()
        got = lazy.suggest(tok, 10)
        after = lazy.io_counters()
        rg_read = after["row_groups_read"] - before["row_groups_read"]
        rows = after["rows_scanned"] - before["rows_scanned"]
        # near-disjoint range layout: a lookup touches ~1 row group (allow a
        # file-boundary neighbor), never a table scan
        assert rg_read <= 2 + len(lazy._unranged), (tok, rg_read, n_rg)
        assert rows <= total_rows // 4, (tok, rows, total_rows)
        # hot-prefix LRU: the repeat reads zero row groups
        again = lazy.io_counters()
        assert lazy.suggest(tok, 10) == got
        final = lazy.io_counters()
        assert final["row_groups_read"] == again["row_groups_read"]
        assert final["rows_scanned"] == again["rows_scanned"]
