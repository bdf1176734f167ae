"""End-to-end: build index over the tiny corpus, assert index invariants and
BM25 rank-identity vs the golden oracle (SURVEY.md §5 items 1, 3, 5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.config import BM25Params, IndexPaths
from nextsearch_api_spark.functions.codec import decode_chunk
from nextsearch_api_spark.operators.query import IndexReader, QuerySpec, batch_search

# Reference query-set classes (FIXTURES.md §2)
QUERIES = [
    (1, "hotterm", 10),
    (2, "buffer", 10),
    (3, "load config", 10),
    (4, "the a an and", 10),            # all stopwords → empty
    (5, "x y", 10),                     # all len<2 → empty
    (6, "zzzznotaterm buffer", 10),     # OOV + known
    (7, "buffer buffer", 10),           # repeated term scores twice
    (8, "Load_Config!", 10),            # tokenizer parity
    (9, "hotterm", 0),                  # k=0 → clamp to 1
    (10, "cache99 flush hotterm score", 100),
    (11, "heapsort", 100),              # duplicate-content docs → tie-break
    (12, "parse index merge", 1),
]


@pytest.fixture(scope="session")
def reader(spark, tiny_index):
    root, _ = tiny_index
    return IndexReader(spark, root)


def test_index_invariants(spark, tiny_index):
    root, oracle = tiny_index
    paths = IndexPaths(root)
    postings = spark.read.parquet(paths.postings)
    lex = spark.read.parquet(paths.lexicon)

    # df == Σ chunk counts == oracle df per term
    lex_map = {r["term"]: r["df"] for r in lex.collect()}
    assert lex_map == oracle.df

    # postings decode: sorted by doc_id, within-term chunks disjoint; tf parity
    rows = postings.collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    for term, chunks in by_term.items():
        chunks.sort(key=lambda r: r["doc_lo"])
        all_ids, all_tfs, all_dls = [], [], []
        prev_hi = -1
        for c in chunks:
            ids, tfs, dls = decode_chunk(c["blob"], c["tf_off"], c["dl_off"])
            assert ids[0] == c["doc_lo"] and ids[-1] == c["doc_hi"]
            assert len(ids) == c["count"]
            assert c["doc_lo"] > prev_hi  # disjoint ordered chunks
            prev_hi = c["doc_hi"]
            assert np.all(np.diff(ids) > 0)  # strictly ascending
            all_ids.append(ids)
            all_tfs.append(tfs)
            all_dls.append(dls)
        ids = np.concatenate(all_ids)
        tfs = np.concatenate(all_tfs)
        dls = np.concatenate(all_dls)
        opl = oracle.postings[term]
        assert np.array_equal(ids, opl["doc_id"].to_numpy()), term
        assert np.array_equal(tfs, opl["tf"].to_numpy()), term
        assert np.array_equal(
            dls, np.array([oracle.doc_len[d] for d in opl["doc_id"]])
        ), term

    # stats parity
    rd = IndexReader(spark, root)
    assert rd.N == oracle.N
    assert abs(rd.avgdl - float(oracle.avgdl)) < 1e-4


def test_docs_table_sha_and_lens(spark, tiny_index, tiny_corpus):
    root, oracle = tiny_index
    docs = spark.read.parquet(IndexPaths(root).docs)
    # content sha256 equality per row vs source (input_hint invariant)
    src = tiny_corpus.withColumn("src_sha", F.sha2("content", 256)).select(
        "repo", "path", "commit", "src_sha"
    )
    joined = docs.join(src, ["repo", "path", "commit"], "inner")
    assert joined.count() == docs.count()
    assert joined.where(F.col("content_sha256") != F.col("src_sha")).count() == 0
    # doc_len parity with oracle
    lens = {r["doc_id"]: r["doc_len"] for r in docs.collect()}
    assert lens == oracle.doc_len


def test_rank_identity_vs_oracle(reader, tiny_index):
    _, oracle = tiny_index
    specs = [QuerySpec(qid, q, k) for qid, q, k in QUERIES]
    res = batch_search(reader, specs).toPandas()
    for qid, q, k in QUERIES:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = oracle.search(q, k)
        assert list(got["doc_id"]) == list(exp["doc_id"]), (
            f"rank mismatch q={q!r}: {list(got['doc_id'])} vs {list(exp['doc_id'])}"
        )
        if len(got):
            g = got["score"].to_numpy(dtype=np.float64)
            e = exp["score"].to_numpy(dtype=np.float64)
            assert np.allclose(g, e, rtol=2e-5), f"score mismatch q={q!r}"
            assert (got["found"] == exp.attrs["found"]).all(), q


def test_found_counts(reader, tiny_index):
    _, oracle = tiny_index
    res = batch_search(reader, [QuerySpec(0, "hotterm", 5)]).toPandas()
    exp = oracle.search("hotterm", 5)
    assert len(res) == 5
    assert res["found"].iloc[0] == exp.attrs["found"]


def test_empty_query_results(reader):
    res = batch_search(reader, [QuerySpec(0, "the a an", 10)]).toPandas()
    assert len(res) == 0


def test_search_one_json_shape(reader):
    from nextsearch_api_spark.operators.query import search_one

    out = search_one(reader, "buffer hotterm", k=3)
    assert set(out) == {"query", "k", "segments", "found", "results"}
    assert out["k"] == 3 and out["segments"] == 1
    assert len(out["results"]) <= 3
    if out["results"]:
        r = out["results"][0]
        assert {"rank", "doc_id", "score", "uid", "repo", "path"} <= set(r)


def test_assign_doc_ids_paths_agree(spark, tiny_corpus):
    """The keys-collect fast path and the distributed sample+count path must
    assign identical dense ids — and both must equal the global key rank."""
    from nextsearch_api_spark.operators.build import assign_doc_ids

    cols = ["repo", "path", "commit", "doc_id"]
    fast = {tuple(r[c] for c in cols[:3]): r["doc_id"]
            for r in assign_doc_ids(tiny_corpus).select(*cols).collect()}
    dist = {tuple(r[c] for c in cols[:3]): r["doc_id"]
            for r in assign_doc_ids(tiny_corpus, driver_keys_max=0)
            .select(*cols).collect()}
    assert fast == dist
    ranked = sorted(fast, key=lambda t: "\x01".join(t).encode("utf-8"))
    assert [fast[t] for t in ranked] == list(range(1, len(ranked) + 1))


def test_assign_doc_ids_non_ascii_keys(spark):
    """Driver-side byte comparison must match Spark's UTF8String binary
    order — exercised with supplementary-plane characters whose UTF-16
    code-unit order DIFFERS from code-point/UTF-8 order."""
    from nextsearch_api_spark.operators.build import assign_doc_ids

    rows = [(r, "p", "c", "x", "body") for r in
            ["！repo", "\U0001f600repo", "zrepo", "arepo", "érepo"]]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    out_fast = {r["repo"]: r["doc_id"] for r in
                assign_doc_ids(df, n_buckets=3).collect()}
    out_dist = {r["repo"]: r["doc_id"] for r in
                assign_doc_ids(df, n_buckets=3, driver_keys_max=0).collect()}
    assert out_fast == out_dist
    ranked = sorted(out_fast, key=lambda r: r.encode("utf-8"))
    assert [out_fast[r] for r in ranked] == [1, 2, 3, 4, 5]
