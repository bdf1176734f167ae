"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2 + the
training-data-pipeline extensions) over the driver's parquet tables
(``documents`` as the text corpus, ``embeddings`` for similarity,
``events`` for windowed aggregation). Each entry has a DuckDB ``oracle_sql``
twin with identical column names/semantics.

Float discipline for oracle-checked entries: everything is computed in
float64 on both sides and rounded; rank columns are computed over
``round(score, 9)`` with doc-id tie-breaks so the two engines' summation
orders cannot flip ranks. The float32 reference-parity path is exercised by
``tests/`` against the NumPy golden oracle instead (SURVEY.md §7.3).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nextsearch_api_spark.functions.text import STOPWORDS, kept_tokens_expr

# ---------------------------------------------------------------- helpers --

_SW_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

# DuckDB token CTEs (shared prefix for most oracles)
_D_TOKS = f"""
toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         x -> x <> '' AND length(x) >= 2 AND x NOT IN ({_SW_SQL}))) AS term
  FROM documents
)"""
_D_TF = """
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2)"""
_D_DL = """
dl AS (SELECT doc_id, count(*)::BIGINT AS doc_len FROM toks GROUP BY 1)"""
_D_DF = """
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)"""

# fixed reference query set for the driver-gate BM25 checks
_BM25_QUERY_TERMS = [
    (1, "join"), (1, "hash"),
    (2, "spark"), (2, "window"), (2, "batch"),
    (3, "customer"),
    (4, "scan"), (4, "filter"), (4, "merge"), (4, "sort"),
]
_BM25_VALUES_SQL = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERY_TERMS)

_SUGGEST_PREFIXES = ["s", "ha", "jo", "cu", "zz"]
_PREFIX_VALUES_SQL = ", ".join(f"('{p}')" for p in _SUGGEST_PREFIXES)

_MINHASH_SEEDS = [0, 1, 2, 3]
_SEED_VALUES_SQL = ", ".join(f"({s})" for s in _MINHASH_SEEDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) exploded kept tokens — Spark mirror of _D_TOKS."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(kept_tokens_expr("text")).alias("term")
    )


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _toks(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def _md5_long(col):
    """Deterministic 60-bit int hash from md5 hex — identical in Spark
    (conv/substring) and DuckDB ('0x…'::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ----------------------------------------------------------- IR core ops --

def q_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-doc term-frequency hash-agg (ForwardIndex.cpp:141-151)."""
    return _tf(spark, sf_dir).select("doc_id", "term", "tf")


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4: document frequency + collection frequency per term."""
    return (
        _tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"),
             F.sum("tf").cast("long").alias("cf"))
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_len per doc (ForwardIndex.cpp:141-151 doc_len computation)."""
    return (
        _toks(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("doc_len"))
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: N + avgdl global stats (ForwardIndex.cpp:187)."""
    return (
        q_doc_stats(spark, sf_dir)
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.round(F.avg("doc_len"), 6).alias("avgdl"))
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative BM25 (float64) over the documents table."""
    tf = _tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("doc_len"))
    # NOTE doc_len = Σtf == kept-token count, same as q_doc_stats
    stats = dl.agg(F.count("*").cast("double").alias("n"),
                   F.avg("doc_len").alias("avgdl"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = spark.createDataFrame(_BM25_QUERY_TERMS, "qid long, term string")
    j = (
        q.join(tf, "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    contrib = (
        F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf").cast("double") * F.lit(2.2)
        / (F.col("tf").cast("double")
           + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("doc_len") / F.col("avgdl")))
    )
    return j.groupBy("qid", "doc_id").agg(F.sum(contrib).alias("score"))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+K1: TAAT BM25 scoring + bounded top-k (api_engine.cpp:444-504),
    declarative DataFrame form, float64."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 9)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("qid", "rank", "doc_id", F.round("score", 4).alias("score"))
    )


def q_bm25_found(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: matched-doc count per query (api_engine.cpp:437,495)."""
    return (
        _bm25_scored(spark, sf_dir)
        .groupBy("qid")
        .agg(F.count("*").cast("long").alias("found"))
    )


def q_engine_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL engine end-to-end: build inverted index (chunked varbyte
    postings) over documents, run the batch query path in f64 mode. Must
    equal the same SQL oracle as the declarative form."""
    from nextsearch_api_spark.config import BM25Params
    from nextsearch_api_spark.operators.query import IndexReader, QuerySpec, batch_search

    root = _engine_index(spark, sf_dir)
    reader = IndexReader(spark, root)
    by_qid: dict[int, list[str]] = {}
    for qid, t in _BM25_QUERY_TERMS:
        by_qid.setdefault(qid, []).append(t)
    specs = [QuerySpec(qid, " ".join(ts), 10) for qid, ts in sorted(by_qid.items())]
    res = batch_search(reader, specs, BM25Params(precision="f64"))
    # engine doc_id = documents.doc_id + 1 (1-based dense rank over the
    # zero-padded doc_id mapping in _engine_index)
    return res.select(
        "qid",
        "rank",
        (F.col("doc_id") - 1).alias("doc_id"),
        F.round("score", 4).alias("score"),
    )


_ENGINE_CACHE: dict[str, str] = {}


def _engine_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents mapped to the corpus schema; path = zero-padded doc_id so
    engine results map back to documents ids losslessly."""
    return _docs(spark, sf_dir).select(
        F.lit("r").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("c").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _engine_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) a real index over documents mapped to the
    corpus schema; doc ordering chosen so engine ids = doc_id + 1."""
    if sf_dir in _ENGINE_CACHE:
        return _ENGINE_CACHE[sf_dir]
    from nextsearch_api_spark.operators.build import build_index

    corpus = _engine_corpus(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        "nsidx_entry_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    build_index(spark, corpus, root)
    _ENGINE_CACHE[sf_dir] = root
    return root


def q_engine_suggest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's PRECOMPUTED suggest table (built by the index pipeline:
    per-prefix top-10 window over lexicon df) filtered to the fixed prefixes —
    must equal the declarative SQL oracle."""
    root = _engine_index(spark, sf_dir)
    sug = spark.read.parquet(os.path.join(root, "suggest"))
    pref = spark.createDataFrame([(p,) for p in _SUGGEST_PREFIXES], "prefix string")
    return (
        sug.join(F.broadcast(pref), "prefix")
        .select("prefix", F.col("rnk").alias("rank"), "term",
                F.col("score").cast("long").alias("df"))
    )


def q_suggest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6/K9: autocomplete ranking — per-prefix top-10 by (df desc, term asc)
    (api_autocomplete.cpp:33-55,113-119)."""
    term_df = (
        _tf(spark, sf_dir).groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    pref = spark.createDataFrame([(p,) for p in _SUGGEST_PREFIXES], "prefix string")
    cand = pref.join(term_df, term_df["term"].startswith(pref["prefix"]))
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("prefix", "rank", "term", "df")
    )


# ------------------------------------------------- dedup / fingerprints --

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keeper = min doc_id."""
    from nextsearch_api_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir), text_col="text")


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash: per (doc, seed) min of a deterministic 60-bit hash over
    3-gram shingles — the LSH building block."""
    from nextsearch_api_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_docs(spark, sf_dir), text_col="text",
                              num_hashes=len(_MINHASH_SEEDS), shingle_n=3)


def q_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding (1 row per band): docs agreeing on any seed's minhash."""
    from nextsearch_api_spark.operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(_docs(spark, sf_dir), text_col="text",
                               num_hashes=len(_MINHASH_SEEDS),
                               rows_per_band=1, shingle_n=3)


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nextsearch_api_spark.operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(_docs(spark, sf_dir), text_col="text",
                               num_hashes=len(_MINHASH_SEEDS),
                               rows_per_band=1, shingle_n=3)


def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: LSH candidate pairs → transitive
    connected components (iterative min-label propagation as DataFrame
    joins) → (doc_id, component = min doc id of the cluster). The DuckDB
    oracle re-derives the same closure with a recursive CTE."""
    from nextsearch_api_spark.operators.dedup import connected_components

    return connected_components(_lsh_pairs(spark, sf_dir))


def q_near_dup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation output of the dedup family: every doc mapped to its
    cluster keeper (component min), is_dup marking the rows a training-data
    pipeline drops."""
    from nextsearch_api_spark.operators.dedup import (
        connected_components, near_dup_keepers,
    )

    comp = connected_components(_lsh_pairs(spark, sf_dir))
    return near_dup_keepers(_docs(spark, sf_dir), comp)


_BOILERPLATE = "this site uses cookies see our privacy policy for details"


def _para_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic paragraph synthesis for the paragraph_dedup gate: the
    testdata texts carry no newlines, so re-chunk each doc's tokens into
    12-token pseudo-paragraphs and append a fixed boilerplate paragraph to
    every 7th doc — the oracle reproduces the same construction, and the
    injected boilerplate guarantees cross-doc paragraph duplication by
    design (the redact_pii injection pattern)."""
    chunked = F.expr(
        "array_join(transform(sequence(0,"
        " cast(ceil(size(split(text, ' ')) / 12.0) as int) - 1),"
        " i -> array_join(slice(split(text, ' '), i * 12 + 1, 12), ' ')),"
        " '\\n')")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(chunked, F.lit("\n" + _BOILERPLATE)))
        .otherwise(chunked).alias("text"),
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (CCNet §3.1 boilerplate removal): only
    the corpus-wide first occurrence of each normalized paragraph survives;
    docs are rebuilt from kept paragraphs in order."""
    from nextsearch_api_spark.operators.dedup import paragraph_dedup

    return paragraph_dedup(_para_docs(spark, sf_dir))


def q_unigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup score for consecutive doc pairs (unigram
    token sets, pairs (i, i+1) for i < 99)."""
    from nextsearch_api_spark.operators.dedup import jaccard_pairs

    td = _toks(spark, sf_dir).distinct()
    pairs = (
        _docs(spark, sf_dir).select("doc_id").where(F.col("doc_id") < 99)
        .select(F.col("doc_id").alias("doc_a"),
                (F.col("doc_id") + 1).alias("doc_b"))
    )
    return jaccard_pairs(td, pairs)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit) per doc over tf-weighted term hashes."""
    from nextsearch_api_spark.operators.dedup import simhash

    return simhash(_tf(spark, sf_dir), bits=32)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over the kept-token sequence."""
    from nextsearch_api_spark.operators.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir), text_col="text")


# ------------------------------------------------------------- curation --

def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: salted-md5 bucket assignment —
    reproducible, partition-independent, growth-stable (existing docs never
    migrate splits as the corpus grows)."""
    from nextsearch_api_spark.operators.curation import hash_split

    return hash_split(_docs(spark, sf_dir))


_PACK_BUDGET = 256
_PACK_SHARDS = 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sequence packing (LLM training-batch prep):
    per-shard order-dependent fold, oracled by a recursive CTE walking the
    same doc order."""
    from nextsearch_api_spark.operators.curation import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=_PACK_BUDGET,
                          n_shards=_PACK_SHARDS)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C style): training docs
    sharing any word 5-gram with the held-out eval slice (doc_id % 20 == 0)
    are flagged. Broadcast semi-join membership test; counts are distinct
    n-grams."""
    from nextsearch_api_spark.operators.curation import ngram_contamination

    docs = _docs(spark, sf_dir)
    return ngram_contamination(docs.where(F.col("doc_id") % 20 != 0),
                               docs.where(F.col("doc_id") % 20 == 0), n=5)


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (dup-line fractions + top-n-gram
    char coverage, n=2..4) — the standard boilerplate/degenerate-text
    quality filter."""
    from nextsearch_api_spark.operators.textstats import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


# deterministic PII suffix appended to every 10th doc so the redaction gate
# exercises real matches on the synthetic corpus (same injection in the
# oracle SQL)
_PII_SUFFIX = (" reach bob.smith+1@example.co.uk or 10.0.0.1"
               " or +14155551234 or 212-555-0187")


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (C4/FineWeb-style regex scrub): emails / IPv4 / phones
    counted and replaced by typed placeholders. PII strings are injected
    deterministically into every 10th doc (the synthetic corpus has none)."""
    from nextsearch_api_spark.operators.curation import redact_pii

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0,
               F.concat(F.col("text"), F.lit(_PII_SUFFIX)))
        .otherwise(F.col("text")).alias("text"),
    )
    return redact_pii(docs)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing resampling (The Pile epochs / DoReMi-weight style):
    per-lang weights applied as deterministic hash-bucket repeats —
    upsample de 2.5x, downsample en to 0.4, drop es, default 1.0."""
    from nextsearch_api_spark.operators.curation import stratified_sample

    return stratified_sample(_docs(spark, sf_dir),
                             {"de": 2.5, "en": 0.4, "es": 0.0},
                             group_col="lang")


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical-LM quality scoring: per-doc cross-entropy /
    perplexity under an add-1 bigram LM trained on the corpus itself."""
    from nextsearch_api_spark.operators.textstats import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir))


def q_quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED quality/hygiene pipeline over the r6 operators (the
    FineWeb-style front half that runs BEFORE dedup/split/pack): inject PII
    → redact → score the CLEAN text with the bigram LM and the top-2-gram
    repetition metric → decontaminate the train slice against the eval
    slice → per-doc keep verdict (not contaminated, perplexity ≤ 30, top
    2-gram coverage ≤ 0.10). Each stage is individually oracled; this entry
    hash-checks their composition — the scorers must consume the REDACTED
    text and the verdict must join all three signal tables without drift."""
    from nextsearch_api_spark.operators.curation import (
        ngram_contamination, redact_pii,
    )
    from nextsearch_api_spark.operators.textstats import (
        bigram_lm_scores, repetition_signals,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0,
               F.concat(F.col("text"), F.lit(_PII_SUFFIX)))
        .otherwise(F.col("text")).alias("text"),
    )
    red = redact_pii(docs)
    clean = red.select("doc_id", F.col("clean_text").alias("text"))
    lm = bigram_lm_scores(clean).select("doc_id", "perplexity")
    rep = repetition_signals(clean, top_ns=(2,)).select(
        "doc_id", "top2gram_char_frac")
    train = clean.where(F.col("doc_id") % 20 != 0)
    decon = ngram_contamination(
        train, clean.where(F.col("doc_id") % 20 == 0), n=5
    ).select("doc_id", "contaminated")
    return (
        train.select("doc_id")
        .join(red.select(
            "doc_id",
            (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
            .alias("pii_count")), "doc_id")
        .join(lm, "doc_id")
        .join(rep, "doc_id")
        .join(decon, "doc_id")
        .select(
            "doc_id", "pii_count", "perplexity", "top2gram_char_frac",
            "contaminated",
            (~F.col("contaminated")
             & (F.col("perplexity") <= 30.0)
             & (F.col("top2gram_char_frac") <= 0.10)).alias("keep"),
        )
    )


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data pipeline (VERDICT r5 next #3): corpus →
    LSH candidate pairs → transitive components → keepers → drop duplicates
    → deterministic split → per-split sequence packing. Every stage is
    individually oracled elsewhere; this entry hash-checks the end-to-end
    composition (cross-operator schema drift, keeper/split interaction)
    against a DuckDB oracle built from the same per-stage SQL."""
    from nextsearch_api_spark.operators.curation import (
        hash_split, pack_sequences,
    )
    from nextsearch_api_spark.operators.dedup import (
        connected_components, near_dup_keepers,
    )

    docs = _docs(spark, sf_dir)
    comp = connected_components(_lsh_pairs(spark, sf_dir))
    keep = near_dup_keepers(docs, comp)
    kept = docs.join(
        keep.where(~F.col("is_dup")).select("doc_id"), "doc_id")
    split = hash_split(kept)
    # pack each split independently — training sequences must never mix
    # documents across train/val/test, so the fold's unit is (split, shard)
    parts = []
    for name in ("train", "val", "test"):
        sub = kept.join(split.where(F.col("split") == name).select("doc_id"),
                        "doc_id")
        packed = pack_sequences(sub, budget=_PACK_BUDGET,
                                n_shards=_PACK_SHARDS)
        parts.append(packed.select(F.lit(name).alias("split"), "shard",
                                   "doc_id", "n_tokens", "seq_id", "offset"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------------- text analytics --

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals: token counts, stopword ratio, punct count."""
    from nextsearch_api_spark.operators.textstats import quality_signals

    return quality_signals(_docs(spark, sf_dir), text_col="text")


def q_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.round(F.avg("n_chars"), 6).alias("avg_chars"))
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts."""
    from nextsearch_api_spark.operators.textstats import language_id

    return language_id(_docs(spark, sf_dir), text_col="text")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 0-1 quality score (length / punct / stopword balance)."""
    from nextsearch_api_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir), text_col="text")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN probe (bucketed index, partition-pruned),
    hash-checked against a DuckDB oracle that inlines the deterministic
    seed-42 hyperplanes as literals (buckets + Hamming-1 multiprobe + exact
    cosine within candidates, all in SQL)."""
    import tempfile

    from nextsearch_api_spark.operators.similarity import (
        ann_lsh_topk, build_ann_index,
    )

    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    path = os.path.join(tempfile.gettempdir(),
                        "ns_ann_" + os.path.basename(os.path.normpath(sf_dir)))
    H = build_ann_index(emb.where(F.col("vec_id") != 0), path,
                        n_planes=8, seed=42)
    return ann_lsh_topk(spark, path, H, qv, k=10, multiprobe=1)


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket self-join (seed-42
    hyperplanes) + exact cosine ≥ τ. Completes the dedup family's vector
    modality; hash-checked against a DuckDB oracle with inlined planes."""
    from nextsearch_api_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    return embedding_near_dup_pairs(_emb(spark, sf_dir), n_planes=8,
                                    seed=42, tau=0.3)


def q_emb_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-modality cluster resolution: embedding near-dup pairs →
    transitive components → (vec_id, component) — the same
    connected-components operator closing the embedding dedup loop."""
    from nextsearch_api_spark.operators.dedup import connected_components
    from nextsearch_api_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    pairs = embedding_near_dup_pairs(_emb(spark, sf_dir), n_planes=8,
                                     seed=42, tau=0.3)
    return connected_components(pairs, id_a="vec_a", id_b="vec_b").select(
        F.col("doc_id").alias("vec_id"), "component")


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup pairs scoped by
    TRAINED spherical-k-means clusters (seed-7 init, exactly
    _IVF_TRAIN_ITERS Lloyd iterations so the unrolled-SQL oracle reproduces
    the centroids), exact cosine ≥ τ within a cluster. Complements the LSH
    modality (emb_near_dup): data-adaptive clusters catch pairs random
    hyperplanes split across buckets."""
    from nextsearch_api_spark.operators.similarity import semantic_dedup_pairs

    # max_cluster lifted far above the gate corpus size: the oracle has no
    # guard, so it must not bind here (pytest exercises the guard + audit)
    return semantic_dedup_pairs(_emb(spark, sf_dir), n_clusters=16, seed=7,
                                train_iters=_IVF_TRAIN_ITERS, tau=0.3,
                                max_cluster=1_000_000)


def q_lsh_guard_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guard-audit of the MinHash-LSH silent caps (no-silent-caps rule):
    docs that produced no shingles and buckets dropped by max_bucket,
    hash-checked against a DuckDB oracle with the same banding."""
    from nextsearch_api_spark.operators.dedup import lsh_guard_metrics

    return lsh_guard_metrics(_docs(spark, sf_dir), text_col="text",
                             num_hashes=len(_MINHASH_SEEDS),
                             rows_per_band=1, shingle_n=3, max_bucket=2)


def q_near_dup_guard_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guard-audit of the embedding near-dup caps: zero-norm vectors and
    degenerate LSH buckets dropped by max_bucket (seed-42 planes)."""
    from nextsearch_api_spark.operators.similarity import near_dup_guard_metrics

    return near_dup_guard_metrics(_emb(spark, sf_dir), n_planes=8, seed=42,
                                  max_bucket=3)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN probe: training-free spherical coarse
    quantizer with deterministic seed-7 centroids, cell-partitioned index,
    top-2-cell probe, exact cosine within. Hash-checked against a DuckDB
    oracle with the centroids inlined as literals."""
    import tempfile

    from nextsearch_api_spark.operators.similarity import (
        build_ivf_index, ivf_topk,
    )

    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    path = os.path.join(tempfile.gettempdir(),
                        "ns_ivf_" + os.path.basename(os.path.normpath(sf_dir)))
    C = build_ivf_index(emb.where(F.col("vec_id") != 0), path,
                        n_centroids=16, seed=7)
    return ivf_topk(spark, path, C, qv, k=10, nprobe=2)


_IVF_TRAIN_ITERS = 4


def q_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF probe: spherical k-means centroids (Lloyd's as
    zero-shuffle mapInPandas partials, deterministic seed-7 init) replace
    the random coarse quantizer. tol=0.0 forces exactly _IVF_TRAIN_ITERS
    Lloyd iterations so the DuckDB oracle — which UNROLLS the same
    iterations as SQL CTE stages over the same rows (VERDICT r4 next #2) —
    computes the identical converged centroids. Recall win over the random
    quantizer: tests/test_pipeline_ops.py::test_trained_ivf_improves_recall."""
    import tempfile

    from nextsearch_api_spark.operators.similarity import (
        build_ivf_index, ivf_topk, train_ivf_centroids,
    )

    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    C = train_ivf_centroids(emb.where(F.col("vec_id") != 0),
                            n_centroids=16, seed=7,
                            max_iter=_IVF_TRAIN_ITERS, tol=0.0)
    path = os.path.join(tempfile.gettempdir(),
                        "ns_ivft_" + os.path.basename(os.path.normpath(sf_dir)))
    C = build_ivf_index(emb.where(F.col("vec_id") != 0), path,
                        n_centroids=16, seed=7, centroids=C)
    return ivf_topk(spark, path, C, qv, k=10, nprobe=2)


_PQ_TRAIN_ITERS = 3


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (Jégou et al. 2011): per-subspace
    k-means codebooks (m=4, ksub=16, seed-11 init, exactly _PQ_TRAIN_ITERS
    Lloyd iterations so the DuckDB oracle — which unrolls the same
    iterations over the same rows — converges identically), corpus encoded
    to 4 int codes per vector (64× smaller than the raw floats), then the
    query scored against the codes via a broadcast-literal lookup table —
    pure JVM expression, no UDF/join/shuffle in the scan."""
    from nextsearch_api_spark.operators.similarity import (
        pq_adc_topk, pq_encode, train_pq_codebooks,
    )

    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    corpus = emb.where(F.col("vec_id") != 0)
    B = train_pq_codebooks(corpus, m=4, ksub=16, seed=11,
                           max_iter=_PQ_TRAIN_ITERS, tol=0.0)
    return pq_adc_topk(pq_encode(corpus, B), B, qv, k=10)


# ------------------------------------------------- similarity / vectors --

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs vec_id=0 (ANN baseline; E2/K7 analog —
    semantic_embedding.cpp:104-145 kNN over normalized vectors)."""
    from nextsearch_api_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk(emb.where(F.col("vec_id") != 0),
                       [float(x) for x in qv], k=10)


def q_cosine_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched vector search: 3 query vectors (embeddings of vec_id 0/1/2,
    qid = source id) share ONE plan. Self-matches stay in (rank 1, cos 1.0
    — standard kNN); excluding them post-rank would leave holes in the
    rank sequence."""
    from nextsearch_api_spark.operators.similarity import cosine_topk_batch

    emb = _emb(spark, sf_dir)
    qvs = {r["vec_id"]: list(r["embedding"])
           for r in emb.where(F.col("vec_id") < 3).collect()}
    return cosine_topk_batch(emb, [(i, qvs[i]) for i in sorted(qvs)], k=10)


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR
    2009) of the lexical BM25 top-10 (qid=2, 'spark window batch') with
    the vector cosine top-10 — the modern two-tier serving pattern the
    reference exposes only as separate endpoints (api_engine.cpp +
    semantic_embedding.cpp). Rank-only fusion, so no score calibration
    between the unbounded BM25 scale and [-1,1] cosine is needed."""
    from nextsearch_api_spark.operators.fusion import rrf_fuse

    lex = (q_bm25_topk(spark, sf_dir).where(F.col("qid") == 2)
           .select("doc_id", "rank"))
    vec = (q_cosine_topk(spark, sf_dir)
           .select(F.col("vec_id").alias("doc_id"), "rank"))
    return rrf_fuse([lex, vec], k=60, topk=10)


def q_hybrid_linear_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, convex-combination rule: per-list min-max
    normalized scores, equal weights. Score-sensitive counterpart of
    q_hybrid_rrf_topk over the same two lists."""
    from nextsearch_api_spark.operators.fusion import linear_fuse

    lex = (q_bm25_topk(spark, sf_dir).where(F.col("qid") == 2)
           .select("doc_id", "score"))
    vec = (q_cosine_topk(spark, sf_dir)
           .select(F.col("vec_id").alias("doc_id"),
                   F.col("cos_sim").alias("score")))
    return linear_fuse([lex, vec], weights=[0.5, 0.5], topk=10)


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (Carbonell & Goldstein 1998) of the cosine
    top-20 down to 5: greedy argmax of 0.5*relevance - 0.5*max-cos-to-
    selected. lam=0.5 keeps (1-lam) exactly representable in float64 so
    the unrolled-SQL oracle's constant matches bit-for-bit."""
    from nextsearch_api_spark.operators.fusion import mmr_rerank
    from nextsearch_api_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    cand = (cosine_topk(emb.where(F.col("vec_id") != 0),
                        [float(x) for x in qv], k=20)
            .join(emb, "vec_id")
            .select("vec_id", "cos_sim", "embedding"))
    return mmr_rerank(cand, lam=0.5, k=5, id_col="vec_id",
                      score_col="cos_sim")


def q_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed retrieval gate (the curation_pipeline pattern applied to
    the serving tier): cosine top-20 → MMR diversity re-rank to 10 → RRF
    fusion with the BM25 qid=2 list → final top-10. Every stage is
    individually oracled; this entry catches cross-operator schema/rank
    drift none of them can see alone."""
    from nextsearch_api_spark.operators.fusion import mmr_rerank, rrf_fuse
    from nextsearch_api_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    cand = (cosine_topk(emb.where(F.col("vec_id") != 0),
                        [float(x) for x in qv], k=20)
            .join(emb, "vec_id")
            .select("vec_id", "cos_sim", "embedding"))
    mmr = mmr_rerank(cand, lam=0.5, k=10, id_col="vec_id",
                     score_col="cos_sim")
    lex = (q_bm25_topk(spark, sf_dir).where(F.col("qid") == 2)
           .select("doc_id", "rank"))
    vec = mmr.select(F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, vec], k=60, topk=10)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as gate DATA (VERDICT r5 next #8): recall@10 of the LSH
    and trained-IVF probes vs the brute-force cosine top-10 on the same
    corpus. Deterministic given the fixed seeds, so it hash-checks — a
    quantizer-quality regression fails the gate rather than a tolerance-y
    pytest. Absolute values are low on this corpus by construction: the
    synthetic embeddings are near-uniform on the sphere, the regime where
    sub-linear ANN provably cannot beat chance by much; recall on
    CLUSTERED data (the real workload) is covered by
    tests/test_pipeline_ops.py::test_trained_ivf_improves_recall."""
    exact = q_cosine_topk(spark, sf_dir).select("vec_id")
    out = None
    for name, fn in (("ivf_trained", q_ann_ivf_trained_topk),
                     ("lsh", q_ann_lsh_topk),
                     ("pq", q_pq_adc_topk)):
        ann = fn(spark, sf_dir).select("vec_id")
        part = (
            ann.join(exact, "vec_id")
            .agg(F.count("*").cast("long").alias("hits"))
            .select(F.lit(name).alias("method"), "hits",
                    F.round(F.col("hits") / 10.0, 6).alias("recall_at_10"))
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_label_centroid_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid L2 norm (embedding aggregate pipeline)."""
    emb = _emb(spark, sf_dir)
    e = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = e.groupBy("label", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    return (
        cent.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"))
    )


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join over the events stream: odd events (the 'measurement'
    side) each pick up the latest prior-or-equal even-event value
    ('reference' side) for the same user — pandas merge_asof / DuckDB ASOF
    JOIN semantics, implemented join-free as one per-user union + window
    carry-forward. The right side is pre-aggregated to unique (user, ts)
    so 'latest prior row' is well-defined (the operator enforces this)."""
    from nextsearch_api_spark.operators.temporal import asof_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    left = ev.where(F.col("event_id") % 2 == 1).select(
        "user_id", "ts", "event_id", F.round("value", 6).alias("value"))
    right = (ev.where(F.col("event_id") % 2 == 0)
             .groupBy("user_id", "ts")
             .agg(F.round(F.max("value"), 6).alias("ref_value")))
    out = asof_join(left, right, on="ts", by="user_id",
                    value_cols=["ref_value"])
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_id", "value", "ref_value")


# ------------------------------------------------------------ streaming --

def q_user_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming session-window operator
    (streaming/ingest.py::stream_user_sessions): classic gaps-and-islands —
    a session breaks where the gap to the previous event of the same user
    exceeds 30 min; session id = running count of breaks. Gives the
    streaming operator an oracle-checked counterpart (events_hourly plays
    the same role for the windowed rollup);
    tests/test_streaming.py::test_sessions_stream_equals_batch_twin proves
    the streaming operator emits exactly these sessions once the watermark
    closes them."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    def _epoch(c):  # events.ts is TIMESTAMP_NTZ; route via LTZ (UTC session)
        return c.cast("timestamp_ltz").cast("long")

    gap_brk = (
        F.when(F.lag("ts").over(w).isNull(), F.lit(0))
        .when(_epoch(F.col("ts")) - _epoch(F.lag("ts").over(w)) > 1800,
              F.lit(1))
        .otherwise(F.lit(0))
    )
    sess = (
        ev.withColumn("brk", gap_brk)
        .withColumn("sess_id", F.sum("brk").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n", "sum_value")
    )


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase matching (overlapping occurrences counted) — the
    fulltext capability the reference's OR-of-terms query path lacks.
    'table table' exercises the overlap convention: 'table table table'
    counts 2."""
    from nextsearch_api_spark.operators.phrase import phrase_match

    return phrase_match(_docs(spark, sf_dir), "table table")


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by occurrence count of 'fast table' (ties →
    ascending doc_id); sort+limit plans as TakeOrderedAndProject."""
    from nextsearch_api_spark.operators.phrase import phrase_topk

    return phrase_topk(_docs(spark, sf_dir), "fast table", k=10)


def q_engine_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-ACCELERATED phrase search over the real engine index:
    conjunctive doc-id-only postings intersection prunes the corpus scan,
    then the exact sliding-window verify ranks survivors. Must equal the
    pure-scan phrase_topk oracle (same phrase) — the acceleration is a
    plan change, never a semantics change. path = zero-padded doc_id maps
    engine results back to documents ids."""
    from nextsearch_api_spark.operators.phrase import phrase_search
    from nextsearch_api_spark.operators.query import IndexReader

    root = _engine_index(spark, sf_dir)
    reader = IndexReader(spark, root)
    res = phrase_search(reader, _engine_corpus(spark, sf_dir),
                        "fast table", k=10)
    return res.select("rank", F.col("path").cast("long").alias("doc_id"),
                      "n_occurrences")


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highlighted result snippets for qid 2's terms — ±30 chars around
    the earliest term hit, every in-window occurrence **marked**."""
    from nextsearch_api_spark.operators.snippet import snippets

    return snippets(_docs(spark, sf_dir), "spark window batch", width=30)


def q_events_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.ingest.stream_dedup_events (at-least-once
    delivery dedup): redeliver every 10th event, then keep one row per
    event_id. Duplicate payloads are identical, so dropDuplicates'
    arbitrary pick is content-deterministic and the result is exactly the
    original events table. The streaming operator's watermark-bounded
    state is exercised in tests/test_streaming.py; this entry pins the
    dedup semantics against the SQL oracle."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dup = ev.unionByName(ev.where(F.col("event_id") % 10 == 0))
    return (dup.dropDuplicates(["event_id"])
            .select("event_id", "ts", "user_id", "event_type",
                    F.round("value", 6).alias("value")))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (batch form of the streaming rollup)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        )
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window aggregate (batch twin of F.window with a slide):
    2-hour windows every hour, so each event lands in exactly two windows —
    the overlap semantics tumbling windows can't express. The oracle
    reproduces Spark's epoch-aligned window starts by fanning each event
    to date_trunc(hour) and date_trunc(hour) − 1h."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy("event_type",
                   F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select("event_type",
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                .alias("win_start"), "n", "sum_value")
    )


def q_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous-interpolation percentiles per event type (Spark
    `percentile`, not the approx sketch — deterministic, so it
    hash-checks against DuckDB's quantile_cont, which uses the same
    p·(n−1) linear-interpolation definition)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
             F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"))
    )


# ------------------------------------------------------------- contract --

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine — build the chunked/compressed inverted index
    over sf0.001 documents, run the BM25 batch query path."""
    return q_engine_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize_tf": q_tokenize_tf,
        "term_df": q_term_df,
        "doc_stats": q_doc_stats,
        "corpus_stats": q_corpus_stats,
        "bm25_topk": q_bm25_topk,
        "bm25_found": q_bm25_found,
        "engine_bm25_topk": q_engine_bm25_topk,
        "suggest_topk": q_suggest_topk,
        "engine_suggest_topk": q_engine_suggest_topk,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidate_pairs": q_lsh_candidate_pairs,
        "near_dup_components": q_near_dup_components,
        "near_dup_keepers": q_near_dup_keepers,
        "paragraph_dedup": q_paragraph_dedup,
        "hash_split": q_hash_split,
        "pack_sequences": q_pack_sequences,
        "curation_pipeline": q_curation_pipeline,
        "decontaminate": q_decontaminate,
        "repetition_signals": q_repetition_signals,
        "redact_pii": q_redact_pii,
        "stratified_sample": q_stratified_sample,
        "lm_perplexity": q_lm_perplexity,
        "quality_filter_pipeline": q_quality_filter_pipeline,
        "unigram_jaccard": q_unigram_jaccard,
        "simhash": q_simhash,
        "doc_fingerprint": q_doc_fingerprint,
        "text_quality": q_text_quality,
        "lang_dist": q_lang_dist,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_recall": q_ann_recall,
        "pq_adc_topk": q_pq_adc_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_trained_topk": q_ann_ivf_trained_topk,
        "emb_near_dup": q_emb_near_dup,
        "semantic_dedup": q_semantic_dedup,
        "emb_near_dup_components": q_emb_near_dup_components,
        "lsh_guard_metrics": q_lsh_guard_metrics,
        "near_dup_guard_metrics": q_near_dup_guard_metrics,
        "cosine_topk": q_cosine_topk,
        "cosine_topk_batch": q_cosine_topk_batch,
        "hybrid_rrf_topk": q_hybrid_rrf_topk,
        "hybrid_linear_topk": q_hybrid_linear_topk,
        "mmr_rerank": q_mmr_rerank,
        "retrieval_pipeline": q_retrieval_pipeline,
        "label_centroid_norm": q_label_centroid_norm,
        "snippets": q_snippets,
        "phrase_match": q_phrase_match,
        "phrase_topk": q_phrase_topk,
        "engine_phrase_topk": q_engine_phrase_topk,
        "events_dedup_batch": q_events_dedup_batch,
        "events_hourly": q_events_hourly,
        "user_sessions_batch": q_user_sessions_batch,
        "events_asof": q_events_asof,
        "events_sliding": q_events_sliding,
        "event_quantiles": q_event_quantiles,
    }


_BM25_SQL_CORE = f"""
WITH {_D_TOKS}, {_D_TF},
dl AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM tf GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(doc_len)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(qid, term) AS (VALUES {_BM25_VALUES_SQL}),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
)"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["tokenize_tf"] = f"WITH {_D_TOKS} SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2"

    sql["term_df"] = (
        f"WITH {_D_TOKS}, {_D_TF} "
        "SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1"
    )

    sql["doc_stats"] = f"WITH {_D_TOKS} SELECT doc_id, count(*)::BIGINT AS doc_len FROM toks GROUP BY 1"

    sql["corpus_stats"] = (
        f"WITH {_D_TOKS}, {_D_DL} "
        "SELECT count(*)::BIGINT AS n_docs, round(avg(doc_len), 6) AS avgdl FROM dl"
    )

    topk_sql = (
        _BM25_SQL_CORE
        + """
SELECT qid, rank, doc_id, round(score, 4) AS score FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rank
  FROM scored) t
WHERE rank <= 10"""
    )
    sql["bm25_topk"] = topk_sql
    sql["engine_bm25_topk"] = topk_sql

    sql["bm25_found"] = (
        _BM25_SQL_CORE
        + " SELECT qid, count(*)::BIGINT AS found FROM scored GROUP BY 1"
    )

    sql["suggest_topk"] = f"""
WITH {_D_TOKS}, {_D_TF},
term_df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
pref(prefix) AS (VALUES {_PREFIX_VALUES_SQL}),
cand AS (
  SELECT pref.prefix, term_df.term, term_df.df,
         row_number() OVER (PARTITION BY pref.prefix ORDER BY term_df.df DESC, term_df.term) AS rank
  FROM pref JOIN term_df ON term_df.term LIKE pref.prefix || '%'
)
SELECT prefix, rank, term, df FROM cand WHERE rank <= 10"""
    sql["engine_suggest_topk"] = sql["suggest_topk"]

    sql["dedup_exact"] = """
SELECT md5(text) AS content_md5, count(*)::BIGINT AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1"""

    shingles_cte = """
ta AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
sh0 AS (
  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
    list_transform(generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    ELSE [] END) AS shingle
  FROM ta),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)"""

    sql["minhash_signatures"] = f"""
WITH {shingles_cte},
seeds(seed) AS (VALUES {_SEED_VALUES_SQL})
SELECT doc_id, seed,
       min(cast(('0x' || substr(md5(seed || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
FROM sh CROSS JOIN seeds
GROUP BY 1, 2"""

    sql["lsh_candidate_pairs"] = f"""
WITH {shingles_cte},
seeds(seed) AS (VALUES {_SEED_VALUES_SQL}),
sig AS (
  SELECT doc_id, seed,
         min(cast(('0x' || substr(md5(seed || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
  FROM sh CROSS JOIN seeds GROUP BY 1, 2)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sig a JOIN sig b
  ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id"""

    # near-dup component oracle: same signatures + pairs, then the
    # TRANSITIVE closure as a recursive CTE — component = min(node, min
    # reachable). Nodes appear iff they have ≥1 candidate edge, matching
    # connected_components' label seed (edge endpoints only).
    _pairs_cte = f"""
seeds(seed) AS (VALUES {_SEED_VALUES_SQL}),
sig AS (
  SELECT doc_id, seed,
         min(cast(('0x' || substr(md5(seed || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
  FROM sh CROSS JOIN seeds GROUP BY 1, 2),
pe AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM sig a JOIN sig b
    ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id <> b.doc_id),
reach(src, dst) AS (
  SELECT src, dst FROM pe
  UNION
  SELECT r.src, e.dst FROM reach r JOIN pe e ON r.dst = e.src),
comp AS (
  SELECT src AS doc_id, least(src, min(dst))::BIGINT AS component
  FROM reach GROUP BY src)"""

    sql["near_dup_components"] = f"""
WITH RECURSIVE {shingles_cte},
{_pairs_cte}
SELECT doc_id, component FROM comp"""

    sql["near_dup_keepers"] = f"""
WITH RECURSIVE {shingles_cte},
{_pairs_cte}
SELECT d.doc_id,
       coalesce(c.component, d.doc_id)::BIGINT AS keeper_doc_id,
       (coalesce(c.component, d.doc_id) <> d.doc_id) AS is_dup
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id"""

    # paragraph_dedup oracle: same deterministic paragraph synthesis
    # (12-token chunks + boilerplate on every 7th doc), then first-occurrence
    # keep via a (key → min(doc_id, pos)) window and an ordered string_agg
    # rebuild. list_transform's index is 1-based (pos = i-1 matches Spark's
    # posexplode).
    sql["paragraph_dedup"] = f"""
WITH chunked AS (
  SELECT doc_id,
         array_to_string(list_transform(
             generate_series(1, cast(ceil(len(string_split(text, ' ')) / 12.0)
                                     AS BIGINT)),
             i -> array_to_string(
                 (string_split(text, ' '))[(i - 1) * 12 + 1 : i * 12], ' ')),
           chr(10)) AS t2
  FROM documents),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN t2 || chr(10) || '{_BOILERPLATE}'
              ELSE t2 END AS text
  FROM chunked),
paras AS (
  SELECT doc_id, s.pos AS pos, s.p AS para, lower(trim(s.p)) AS key
  FROM (SELECT doc_id,
               unnest(list_transform(string_split(text, chr(10)),
                                     (x, i) -> {{'pos': i - 1, 'p': x}})) AS s
        FROM src) t
  WHERE lower(trim(s.p)) <> ''),
first AS (
  SELECT key, doc_id, pos FROM (
    SELECT key, doc_id, pos,
           row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
    FROM paras) t WHERE rn = 1),
kept AS (
  SELECT p.doc_id, p.pos, p.para
  FROM paras p JOIN first f
    ON f.key = p.key AND f.doc_id = p.doc_id AND f.pos = p.pos),
reb AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS clean_text,
               count(*)::BIGINT AS n_kept
        FROM kept GROUP BY 1),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_paras FROM paras GROUP BY 1)
SELECT d.doc_id,
       coalesce(reb.clean_text, '') AS clean_text,
       coalesce(tot.n_paras, 0) AS n_paras,
       coalesce(reb.n_kept, 0) AS n_kept,
       coalesce(tot.n_paras, 0) - coalesce(reb.n_kept, 0) AS n_removed
FROM src d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)"""

    # guard-metrics oracle: same shingles + signatures; with rows_per_band=1
    # a band bucket is exactly one (seed, minhash) group, so bucket sizes
    # (and the max_bucket drop counts) group directly on those columns
    sql["lsh_guard_metrics"] = f"""
WITH {shingles_cte},
seeds(seed) AS (VALUES {_SEED_VALUES_SQL}),
sig AS (
  SELECT doc_id, seed,
         min(cast(('0x' || substr(md5(seed || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
  FROM sh CROSS JOIN seeds GROUP BY 1, 2),
sizes AS (SELECT seed, minhash, count(*)::BIGINT AS bsz FROM sig GROUP BY 1, 2),
dc AS (SELECT count(DISTINCT doc_id)::BIGINT AS docs_total FROM documents),
ws AS (SELECT count(DISTINCT doc_id)::BIGINT AS with_sh FROM sh),
bc AS (SELECT count(*)::BIGINT AS buckets_total,
              coalesce(sum(CASE WHEN bsz > 2 THEN 1 ELSE 0 END), 0)::BIGINT AS dropped_buckets,
              coalesce(sum(CASE WHEN bsz > 2 THEN bsz ELSE 0 END), 0)::BIGINT AS dropped_band_rows
       FROM sizes)
SELECT dc.docs_total,
       (dc.docs_total - ws.with_sh)::BIGINT AS docs_without_shingles,
       bc.buckets_total, bc.dropped_buckets, bc.dropped_band_rows
FROM dc, ws, bc"""

    # hash_split oracle: same salted-md5 bucket + cumulative boundaries
    # (train 0.9 / val 0.05 / test 0.05 → 900000 / 950000 of 1e6)
    sql["hash_split"] = """
SELECT doc_id,
       CASE WHEN b < 900000 THEN 'train'
            WHEN b < 950000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             cast(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT)
             % 1000000 AS b
      FROM documents)"""

    # pack_sequences oracle: the greedy fold re-derived as a RECURSIVE CTE
    # walking each shard in doc-id order (row_number chain) with the same
    # rule — new sequence iff the running offset is non-zero and would
    # overflow the budget; oversized docs occupy a sequence alone. Shard =
    # salted-md5 bucket (the hash_split scheme), matching the operator's
    # id-scheme-robust sharding.
    sql["pack_sequences"] = f"""
WITH RECURSIVE counts AS (
  SELECT (cast(('0x' || substr(md5('shard:' || doc_id), 1, 15)) AS BIGINT)
          % {_PACK_SHARDS})::INT AS shard, doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY cast(('0x' || substr(md5('shard:' || doc_id), 1, 15)) AS BIGINT) % {_PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM documents),
walk(shard, rn, doc_id, n_tokens, seq_id, off) AS (
  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, 0::BIGINT
  FROM counts WHERE rn = 1
  UNION ALL
  SELECT c.shard, c.rn, c.doc_id, c.n_tokens,
         CASE WHEN w.off + w.n_tokens > 0
                   AND w.off + w.n_tokens + c.n_tokens > {_PACK_BUDGET}
              THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.off + w.n_tokens > 0
                   AND w.off + w.n_tokens + c.n_tokens > {_PACK_BUDGET}
              THEN 0 ELSE w.off + w.n_tokens END
  FROM walk w JOIN counts c ON c.shard = w.shard AND c.rn = w.rn + 1)
SELECT shard, doc_id, n_tokens, seq_id, off AS offset FROM walk"""

    # curation_pipeline oracle: the per-stage SQL composed end-to-end —
    # pairs → transitive closure → keepers → keep non-dups → md5 split →
    # the greedy pack walk partitioned by (split, shard)
    _shard_b = ("cast(('0x' || substr(md5('shard:' || doc_id), 1, 15)) "
                f"AS BIGINT) % {_PACK_SHARDS}")
    sql["curation_pipeline"] = f"""
WITH RECURSIVE {shingles_cte},
{_pairs_cte},
keep AS (
  SELECT d.doc_id, d.text FROM documents d
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  WHERE coalesce(c.component, d.doc_id) = d.doc_id),
sp AS (
  SELECT doc_id, text,
         CASE WHEN b < 900000 THEN 'train'
              WHEN b < 950000 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, text,
               cast(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT)
               % 1000000 AS b
        FROM keep)),
counts AS (
  SELECT split, ({_shard_b})::INT AS shard, doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY split, {_shard_b}
                            ORDER BY doc_id) AS rn
  FROM sp),
walk(split, shard, rn, doc_id, n_tokens, seq_id, off) AS (
  SELECT split, shard, rn, doc_id, n_tokens, 0::BIGINT, 0::BIGINT
  FROM counts WHERE rn = 1
  UNION ALL
  SELECT c.split, c.shard, c.rn, c.doc_id, c.n_tokens,
         CASE WHEN w.off + w.n_tokens > 0
                   AND w.off + w.n_tokens + c.n_tokens > {_PACK_BUDGET}
              THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.off + w.n_tokens > 0
                   AND w.off + w.n_tokens + c.n_tokens > {_PACK_BUDGET}
              THEN 0 ELSE w.off + w.n_tokens END
  FROM walk w JOIN counts c
    ON c.split = w.split AND c.shard = w.shard AND c.rn = w.rn + 1)
SELECT split, shard, doc_id, n_tokens, seq_id, off AS offset FROM walk"""

    # decontaminate oracle: distinct word 5-grams, eval slice = doc_id%20==0
    sql["decontaminate"] = """
WITH toks AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '') AS t FROM documents),
g AS (SELECT doc_id,
       unnest(CASE WHEN len(t) >= 5 THEN
         list_transform(generate_series(1, len(t) - 4),
                        i -> array_to_string(t[i:i+4], ' '))
         ELSE [] END) AS ngram FROM toks),
tg AS (SELECT DISTINCT doc_id, ngram FROM g WHERE doc_id % 20 <> 0),
eg AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 20 = 0),
tot AS (SELECT doc_id, count(*)::BIGINT AS total_ngrams FROM tg GROUP BY 1),
ov AS (SELECT tg.doc_id, count(*)::BIGINT AS overlap_ngrams
       FROM tg JOIN eg USING (ngram) GROUP BY 1)
SELECT d.doc_id,
       coalesce(tot.total_ngrams, 0)::BIGINT AS total_ngrams,
       coalesce(ov.overlap_ngrams, 0)::BIGINT AS overlap_ngrams,
       coalesce(ov.overlap_ngrams, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
LEFT JOIN tot USING (doc_id)
LEFT JOIN ov USING (doc_id)"""

    # repetition_signals oracle: same relational construction — line counts
    # keyed (doc, line), n-gram counts keyed (doc, n, gram), top gram by
    # (count desc, gram asc), coverage capped at 1.0
    sql["repetition_signals"] = """
WITH lines0 AS (SELECT doc_id,
       unnest(list_filter(string_split(text, chr(10)), x -> x <> ''))
       AS line FROM documents),
lcnt AS (SELECT doc_id, line, count(*)::BIGINT AS c FROM lines0 GROUP BY 1, 2),
lm AS (SELECT doc_id, sum(c)::BIGINT AS lines_total,
              count(*)::BIGINT AS lines_distinct,
              sum(length(line) * c)::BIGINT AS line_chars,
              sum(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END)::BIGINT
              AS dup_line_chars
       FROM lcnt GROUP BY 1),
toks AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '') AS t FROM documents),
tch AS (SELECT doc_id, coalesce(len(array_to_string(t, '')), 0)::BIGINT
               AS token_chars FROM toks),
grams AS (SELECT doc_id, n,
       unnest(CASE WHEN len(t) >= n THEN
         list_transform(generate_series(1, len(t) - n + 1),
                        i -> array_to_string(t[i:i+n-1], ' '))
         ELSE [] END) AS gram
       FROM toks CROSS JOIN (SELECT unnest([2, 3, 4]) AS n) ns),
gc AS (SELECT doc_id, n, gram, count(*)::BIGINT AS c
       FROM grams GROUP BY 1, 2, 3),
top AS (SELECT doc_id, n, c, gram,
               row_number() OVER (PARTITION BY doc_id, n
                                  ORDER BY c DESC, gram) AS rn FROM gc),
cov AS (SELECT doc_id, n, (length(replace(gram, ' ', '')) * c)::BIGINT
               AS covered FROM top WHERE rn = 1)
SELECT d.doc_id,
       coalesce(lm.lines_total, 0)::BIGINT AS lines_total,
       round(CASE WHEN coalesce(lm.lines_total, 0) > 0
             THEN (lm.lines_total - lm.lines_distinct)::DOUBLE
                  / lm.lines_total ELSE 0 END, 6) AS dup_line_frac,
       round(CASE WHEN coalesce(lm.line_chars, 0) > 0
             THEN lm.dup_line_chars::DOUBLE / lm.line_chars
             ELSE 0 END, 6) AS dup_line_char_frac,
       round(least(1.0, CASE WHEN tch.token_chars > 0
             THEN coalesce(c2.covered, 0)::DOUBLE / tch.token_chars
             ELSE 0 END), 6) AS top2gram_char_frac,
       round(least(1.0, CASE WHEN tch.token_chars > 0
             THEN coalesce(c3.covered, 0)::DOUBLE / tch.token_chars
             ELSE 0 END), 6) AS top3gram_char_frac,
       round(least(1.0, CASE WHEN tch.token_chars > 0
             THEN coalesce(c4.covered, 0)::DOUBLE / tch.token_chars
             ELSE 0 END), 6) AS top4gram_char_frac
FROM documents d
LEFT JOIN lm USING (doc_id)
LEFT JOIN tch USING (doc_id)
LEFT JOIN (SELECT doc_id, covered FROM cov WHERE n = 2) c2 USING (doc_id)
LEFT JOIN (SELECT doc_id, covered FROM cov WHERE n = 3) c3 USING (doc_id)
LEFT JOIN (SELECT doc_id, covered FROM cov WHERE n = 4) c4 USING (doc_id)"""

    # redact_pii oracle: same patterns (Java/RE2 common subset), same
    # injection, same sequential replacement order; DuckDB needs the 'g'
    # flag (its regexp_replace is first-match by default, Spark's is global)
    _pii_email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _pii_ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    _pii_phone = "\\+\\d{9,15}\\b|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    sql["redact_pii"] = f"""
WITH src AS (SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN text || '{_PII_SUFFIX}'
            ELSE text END AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_pii_email}'))::BIGINT AS n_email,
       len(regexp_extract_all(text, '{_pii_ipv4}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '{_pii_phone}'))::BIGINT AS n_phone,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_pii_email}', '<EMAIL>', 'g'),
           '{_pii_ipv4}', '<IP>', 'g'),
           '{_pii_phone}', '<PHONE>', 'g') AS clean_text
FROM src"""

    # stratified_sample oracle: same salted-md5 bucket as hash_split, copies
    # via generate_series; floor (not cast) on the fractional threshold
    sql["stratified_sample"] = """
WITH w AS (SELECT doc_id, lang AS "group",
       CASE lang WHEN 'de' THEN 2.5 WHEN 'en' THEN 0.4
                 WHEN 'es' THEN 0.0 ELSE 1.0 END AS wt,
       cast(('0x' || substr(md5('mix:' || doc_id), 1, 15)) AS BIGINT)
       % 1000000 AS b FROM documents),
n AS (SELECT doc_id, "group",
       (floor(wt)::BIGINT
        + CASE WHEN b < floor((wt % 1.0) * 1000000)::BIGINT
               THEN 1 ELSE 0 END) AS n_copies FROM w)
SELECT doc_id, "group", unnest(generate_series(0, n_copies - 1)) AS copy
FROM n WHERE n_copies > 0"""

    # lm_perplexity oracle: add-1 bigram LM trained on the corpus itself,
    # same alnum tokenization, same smoothing formula
    sql["lm_perplexity"] = """
WITH toks AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '') AS t FROM documents),
bi AS (SELECT doc_id,
       unnest(CASE WHEN len(t) >= 2 THEN
         list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1])
         ELSE [] END) AS gram FROM toks),
model_bi AS (SELECT gram, count(*)::BIGINT AS c_vw FROM bi GROUP BY 1),
model_v AS (SELECT split_part(gram, ' ', 1) AS v, sum(c_vw)::BIGINT AS c_v
            FROM model_bi GROUP BY 1),
vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS V
          FROM (SELECT unnest(t) AS tok FROM toks)),
doc_bi AS (SELECT doc_id, gram, count(*)::BIGINT AS m FROM bi GROUP BY 1, 2),
scored AS (SELECT db.doc_id, sum(db.m)::BIGINT AS n_bigrams,
       -sum(db.m * log2((coalesce(mb.c_vw, 0) + 1.0)
                        / (coalesce(mv.c_v, 0) + vocab.V)))
        / sum(db.m) AS h
       FROM doc_bi db
       LEFT JOIN model_bi mb USING (gram)
       LEFT JOIN model_v mv ON mv.v = split_part(db.gram, ' ', 1)
       CROSS JOIN vocab GROUP BY 1, vocab.V)
SELECT d.doc_id,
       coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       round(coalesce(s.h, 0.0), 6) AS cross_entropy,
       round(pow(2.0, coalesce(s.h, 0.0)), 6) AS perplexity
FROM documents d LEFT JOIN scored s USING (doc_id)"""

    # quality_filter_pipeline oracle: the r6 stages composed in one flat
    # WITH — inject → redact → LM + repetition + decontamination over the
    # CLEAN text (one shared tokenization CTE) → keep verdict
    sql["quality_filter_pipeline"] = f"""
WITH src AS (SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN text || '{_PII_SUFFIX}'
            ELSE text END AS text FROM documents),
red AS (SELECT doc_id,
       (len(regexp_extract_all(text, '{_pii_email}'))
        + len(regexp_extract_all(text, '{_pii_ipv4}'))
        + len(regexp_extract_all(text, '{_pii_phone}')))::BIGINT AS pii_count,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_pii_email}', '<EMAIL>', 'g'),
           '{_pii_ipv4}', '<IP>', 'g'),
           '{_pii_phone}', '<PHONE>', 'g') AS text
       FROM src),
ctoks AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '') AS t FROM red),
lm_bi AS (SELECT doc_id,
       unnest(CASE WHEN len(t) >= 2 THEN
         list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1])
         ELSE [] END) AS gram FROM ctoks),
lm_model_bi AS (SELECT gram, count(*)::BIGINT AS c_vw FROM lm_bi GROUP BY 1),
lm_model_v AS (SELECT split_part(gram, ' ', 1) AS v, sum(c_vw)::BIGINT AS c_v
               FROM lm_model_bi GROUP BY 1),
lm_vocab AS (SELECT count(DISTINCT tok)::DOUBLE AS V
             FROM (SELECT unnest(t) AS tok FROM ctoks)),
lm_doc_bi AS (SELECT doc_id, gram, count(*)::BIGINT AS m
              FROM lm_bi GROUP BY 1, 2),
lm_scored AS (SELECT db.doc_id,
       -sum(db.m * log2((coalesce(mb.c_vw, 0) + 1.0)
                        / (coalesce(mv.c_v, 0) + lm_vocab.V)))
        / sum(db.m) AS h
       FROM lm_doc_bi db
       LEFT JOIN lm_model_bi mb USING (gram)
       LEFT JOIN lm_model_v mv ON mv.v = split_part(db.gram, ' ', 1)
       CROSS JOIN lm_vocab GROUP BY 1, lm_vocab.V),
lm AS (SELECT r.doc_id,
       round(pow(2.0, coalesce(s.h, 0.0)), 6) AS perplexity
       FROM red r LEFT JOIN lm_scored s USING (doc_id)),
rp_gc AS (SELECT doc_id, gram, count(*)::BIGINT AS c
          FROM lm_bi GROUP BY 1, 2),
rp_top AS (SELECT doc_id, c, gram,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, gram) AS rn FROM rp_gc),
rp_tch AS (SELECT doc_id, coalesce(len(array_to_string(t, '')), 0)::BIGINT
           AS token_chars FROM ctoks),
rep AS (SELECT r.doc_id,
       round(least(1.0, CASE WHEN tch.token_chars > 0
             THEN coalesce(length(replace(top.gram, ' ', '')) * top.c, 0)::DOUBLE
                  / tch.token_chars ELSE 0 END), 6) AS top2gram_char_frac
       FROM red r
       LEFT JOIN rp_tch tch USING (doc_id)
       LEFT JOIN (SELECT doc_id, gram, c FROM rp_top WHERE rn = 1) top
       USING (doc_id)),
dc_g AS (SELECT doc_id,
       unnest(CASE WHEN len(t) >= 5 THEN
         list_transform(generate_series(1, len(t) - 4),
                        i -> array_to_string(t[i:i+4], ' '))
         ELSE [] END) AS ngram FROM ctoks),
dc_tg AS (SELECT DISTINCT doc_id, ngram FROM dc_g WHERE doc_id % 20 <> 0),
dc_eg AS (SELECT DISTINCT ngram FROM dc_g WHERE doc_id % 20 = 0),
dc_ov AS (SELECT dc_tg.doc_id, count(*)::BIGINT AS overlap_ngrams
          FROM dc_tg JOIN dc_eg USING (ngram) GROUP BY 1),
decon AS (SELECT d.doc_id,
          coalesce(ov.overlap_ngrams, 0) > 0 AS contaminated
          FROM (SELECT doc_id FROM red WHERE doc_id % 20 <> 0) d
          LEFT JOIN dc_ov ov USING (doc_id))
SELECT t.doc_id, red.pii_count, lm.perplexity, rep.top2gram_char_frac,
       decon.contaminated,
       (NOT decon.contaminated AND lm.perplexity <= 30.0
        AND rep.top2gram_char_frac <= 0.10) AS keep
FROM (SELECT doc_id FROM red WHERE doc_id % 20 <> 0) t
JOIN red USING (doc_id)
JOIN lm USING (doc_id)
JOIN rep USING (doc_id)
JOIN decon USING (doc_id)"""

    sql["unigram_jaccard"] = f"""
WITH {_D_TOKS},
td AS (SELECT DISTINCT doc_id, term FROM toks),
sizes AS (SELECT doc_id, count(*)::BIGINT AS c FROM td GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, count(*)::BIGINT AS inter
  FROM td a JOIN td b ON b.doc_id = a.doc_id + 1 AND a.term = b.term
  WHERE a.doc_id < 99 GROUP BY 1)
SELECT i.doc_a, i.doc_a + 1 AS doc_b,
       round(i.inter / (sa.c + sb.c - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_a + 1"""

    sql["simhash"] = f"""
WITH {_D_TOKS}, {_D_TF},
th AS (SELECT doc_id, tf, cast(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tf),
bits AS (SELECT b FROM range(0, 32) t(b)),
s AS (
  SELECT doc_id, b,
         sum(CASE WHEN ((h >> b) & 1) = 1 THEN tf ELSE -tf END) AS s
  FROM th CROSS JOIN bits GROUP BY 1, 2)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM s GROUP BY 1"""

    sql["doc_fingerprint"] = f"""
SELECT doc_id,
  list_reduce(
    list_prepend(0::BIGINT,
      list_transform(
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> '' AND length(x) >= 2 AND x NOT IN ({_SW_SQL})),
        t -> cast(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 1000000)),
    (acc, x) -> (acc * 31 + x) % 1000000007
  ) AS fingerprint
FROM documents"""

    sql["text_quality"] = f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))::BIGINT AS alnum_tokens,
  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      x -> x <> '' AND length(x) >= 2 AND x NOT IN ({_SW_SQL})))::BIGINT AS kept_tokens,
  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      x -> x IN ({_SW_SQL})))::BIGINT AS stopword_tokens,
  length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::BIGINT AS punct_chars
FROM documents"""

    sql["lang_dist"] = """
SELECT lang, count(*)::BIGINT AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY 1"""

    from nextsearch_api_spark.operators.textstats import LANG_PROFILES
    hit_selects = []
    for lang, words in LANG_PROFILES.items():
        wl = ", ".join(f"'{w}'" for w in words)
        hit_selects.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
            f"x -> x <> '' AND x IN ({wl})))::BIGINT AS h FROM documents"
        )
    hits_union = "\nUNION ALL\n".join(hit_selects)
    sql["lang_id"] = f"""
WITH hits AS (
{hits_union}
),
best AS (
  SELECT doc_id, lang, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
  FROM hits)
SELECT doc_id,
       CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_pred,
       h AS lang_hits
FROM best WHERE rn = 1"""

    sql["quality_score"] = f"""
WITH sig AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        x -> x <> ''))::BIGINT AS alnum,
    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        x -> x IN ({_SW_SQL})))::BIGINT AS stopw,
    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::BIGINT AS punct
  FROM documents)
SELECT doc_id,
  round(least(alnum / 100.0, 1.0) * 0.4
        + greatest(0.0, 1.0 - punct / greatest(alnum, 1)) * 0.3
        + (1.0 - abs(stopw / greatest(alnum, 1) - 0.3) / 0.7) * 0.3,
        6) AS quality
FROM sig"""
    # ann_lsh_topk oracle: the seeded hyperplanes ARE deterministic, so they
    # inline as 8×64 DOUBLE literals (VERDICT r1 'next' #2). The SQL computes
    # each vector's sign-pattern bucket, probes the query's bucket plus all
    # Hamming-1 neighbors (multiprobe=1), and ranks exact cosine within the
    # candidate set — the full Spark semantics, hash-checked.
    from nextsearch_api_spark.operators.similarity import hyperplanes
    H = hyperplanes(64, 8, seed=42)
    plane_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in H[i]))
        for i in range(8)
    )
    sql["ann_lsh_topk"] = f"""
WITH planes(pid, pv) AS (VALUES
    {plane_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
buck AS (
  SELECT vec_id, v,
         sum(CASE WHEN list_dot_product(v, pv) > 0
                  THEN 1 << pid ELSE 0 END)::INT AS bucket
  FROM vecs CROSS JOIN planes GROUP BY vec_id, v),
q AS (SELECT v AS qv, bucket AS qb FROM buck WHERE vec_id = 0),
sims AS (
  SELECT b.vec_id,
         list_dot_product(b.v, q.qv)
         / (sqrt(list_dot_product(b.v, b.v))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM buck b CROSS JOIN q
  WHERE b.vec_id <> 0
    AND (b.bucket = q.qb OR bit_count(xor(b.bucket, q.qb)) = 1))
SELECT rank, vec_id, round(cos, 6) AS cos_sim FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY round(cos, 9) DESC, vec_id) AS rank
  FROM sims) t
WHERE rank <= 10"""

    # emb_near_dup oracle: same inlined planes; bucket self-join + cosine ≥ τ
    sql["emb_near_dup"] = f"""
WITH planes(pid, pv) AS (VALUES
    {plane_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
buck AS (
  SELECT vec_id, v,
         sum(CASE WHEN list_dot_product(v, pv) > 0
                  THEN 1 << pid ELSE 0 END)::INT AS bucket
  FROM vecs CROSS JOIN planes GROUP BY vec_id, v)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
FROM buck a JOIN buck b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3"""

    # emb_near_dup_components oracle: the same inlined-planes pair graph,
    # symmetrized, closed transitively by a recursive CTE; component =
    # min(node, min reachable) — identical construction to
    # near_dup_components on the text modality
    sql["emb_near_dup_components"] = f"""
WITH RECURSIVE planes(pid, pv) AS (VALUES
    {plane_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
buck AS (
  SELECT vec_id, v,
         sum(CASE WHEN list_dot_product(v, pv) > 0
                  THEN 1 << pid ELSE 0 END)::INT AS bucket
  FROM vecs CROSS JOIN planes GROUP BY vec_id, v),
p0 AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM buck a JOIN buck b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3),
pe AS (SELECT src, dst FROM p0 UNION SELECT dst, src FROM p0),
reach(src, dst) AS (
  SELECT src, dst FROM pe
  UNION
  SELECT r.src, e.dst FROM reach r JOIN pe e ON r.dst = e.src)
SELECT src AS vec_id, least(src, min(dst))::BIGINT AS component
FROM reach GROUP BY src"""

    # near-dup guard-metrics oracle: same inlined planes; bucket sizes +
    # zero-norm counts (dot(v,v)=0 ⇔ sqrt-norm=0 — squares can't cancel)
    sql["near_dup_guard_metrics"] = f"""
WITH planes(pid, pv) AS (VALUES
    {plane_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
buck AS (
  SELECT vec_id,
         sum(CASE WHEN list_dot_product(v, pv) > 0
                  THEN 1 << pid ELSE 0 END)::INT AS bucket
  FROM vecs CROSS JOIN planes GROUP BY vec_id),
vc AS (SELECT count(*)::BIGINT AS vecs_total,
              coalesce(sum(CASE WHEN list_dot_product(v, v) = 0 THEN 1 ELSE 0 END), 0)::BIGINT AS zero_norm_vecs
       FROM vecs),
sizes AS (SELECT bucket, count(*)::BIGINT AS bsz FROM buck GROUP BY 1),
bc AS (SELECT count(*)::BIGINT AS buckets_total,
              coalesce(sum(CASE WHEN bsz > 3 THEN 1 ELSE 0 END), 0)::BIGINT AS dropped_buckets,
              coalesce(sum(CASE WHEN bsz > 3 THEN bsz ELSE 0 END), 0)::BIGINT AS dropped_vecs
       FROM sizes)
SELECT vc.vecs_total, vc.zero_norm_vecs,
       bc.buckets_total, bc.dropped_buckets, bc.dropped_vecs
FROM vc, bc"""

    # ann_ivf_topk oracle: seed-7 centroids inlined; cell = per-vector argmax
    # dot (row_number window), probe = top-2 centroids for the query, exact
    # cosine within probed cells
    from nextsearch_api_spark.operators.similarity import ivf_centroids
    C = ivf_centroids(64, 16, seed=7)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in C[i]))
        for i in range(16)
    )
    sql["ann_ivf_topk"] = f"""
WITH cents(cid, cv) AS (VALUES
    {cent_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
assign AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, cv) DESC, cid) AS rn
  FROM vecs CROSS JOIN cents),
cells AS (SELECT vec_id, v, cid AS cell FROM assign WHERE rn = 1),
q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
qprobe AS (
  SELECT cid FROM cents CROSS JOIN q
  ORDER BY list_dot_product(q.qv, cv) DESC, cid LIMIT 2),
sims AS (
  SELECT c.vec_id,
         list_dot_product(c.v, q.qv)
         / (sqrt(list_dot_product(c.v, c.v))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM cells c CROSS JOIN q
  WHERE c.vec_id <> 0 AND c.cell IN (SELECT cid FROM qprobe))
SELECT rank, vec_id, round(cos, 6) AS cos_sim FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY round(cos, 9) DESC, vec_id) AS rank
  FROM sims) t
WHERE rank <= 10"""

    # ann_ivf_trained_topk oracle (VERDICT r4 next #2 — was the only
    # gate entry without an oracle): spherical k-means IS SQL-expressible
    # once the iteration count is fixed — the Spark entry trains with
    # tol=0.0 for exactly _IVF_TRAIN_ITERS Lloyd iterations, and this SQL
    # UNROLLS the same iterations as CTE stages from the same seed-7 init
    # (inlined literals above) over the same rows (vec_id <> 0):
    # E-step = argmax-dot assignment (row_number window, ties → lowest cid;
    # scale-invariant, so raw v ≡ normalized v), M-step = per-cell
    # element-wise sum of UNIT vectors renormalized to the sphere, empty /
    # cancelled cells keep the previous centroid. Probe + exact-cosine
    # top-k then mirror ann_ivf_topk with the converged centroids. All
    # float64 on both sides; assignment margins (~1e-2) dwarf the last-ulp
    # summation-order drift, so argmax decisions agree.
    def _kmeans_chain(n_iters: int) -> str:
        """Unrolled spherical-k-means CTE stages over a ``vn(vec_id, u)``
        CTE of unit vectors, starting from ``cents0`` — shared by the
        trained-IVF and SemDeDup oracles (their ``vn`` populations differ)."""
        iters = []
        for it in range(1, n_iters + 1):
            p = it - 1
            iters.append(f"""
a{it} AS (
  SELECT vec_id, u, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(u, cv) DESC, cid) AS rn
  FROM vn CROSS JOIN cents{p}),
s{it} AS (
  SELECT cid, dim, sum(u[dim]) AS sx
  FROM (SELECT u, cid FROM a{it} WHERE rn = 1) t
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) d
  GROUP BY 1, 2),
sv{it} AS (SELECT cid, list(sx ORDER BY dim) AS sv FROM s{it} GROUP BY 1),
cents{it} AS (
  SELECT c.cid,
         CASE WHEN s.sv IS NOT NULL AND list_dot_product(s.sv, s.sv) > 0
              THEN list_transform(s.sv, x -> x / sqrt(list_dot_product(s.sv, s.sv)))
              ELSE c.cv END AS cv
  FROM cents{p} c LEFT JOIN sv{it} s ON s.cid = c.cid)""")
        return ",".join(iters)

    kmeans_chain = _kmeans_chain(_IVF_TRAIN_ITERS)
    n_it = _IVF_TRAIN_ITERS
    sql["ann_ivf_trained_topk"] = f"""
WITH cents0(cid, cv) AS (VALUES
    {cent_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
vn AS (
  SELECT vec_id,
         CASE WHEN list_dot_product(v, v) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS u
  FROM vecs WHERE vec_id <> 0),{kmeans_chain},
assign AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, cv) DESC, cid) AS rn
  FROM vecs CROSS JOIN cents{n_it}
  WHERE vec_id <> 0),
cells AS (SELECT vec_id, v, cid AS cell FROM assign WHERE rn = 1),
q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
qprobe AS (
  SELECT cid FROM cents{n_it} CROSS JOIN q
  ORDER BY list_dot_product(q.qv, cv) DESC, cid LIMIT 2),
sims AS (
  SELECT c.vec_id,
         list_dot_product(c.v, q.qv)
         / (sqrt(list_dot_product(c.v, c.v))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM cells c CROSS JOIN q
  WHERE c.cell IN (SELECT cid FROM qprobe))
SELECT rank, vec_id, round(cos, 6) AS cos_sim FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY round(cos, 9) DESC, vec_id) AS rank
  FROM sims) t
WHERE rank <= 10"""

    # semantic_dedup oracle (SemDeDup, Abbas et al. 2023): the SAME unrolled
    # spherical-k-means chain — over ALL vectors this time (dedup has no
    # designated query row) — then within-cluster pairwise exact cosine with
    # the identical round(·,6) ≥ τ rule the Spark operator applies. The
    # argmax assignment is scale-invariant, so assigning raw v ≡ unit u.
    sql["semantic_dedup"] = f"""
WITH cents0(cid, cv) AS (VALUES
    {cent_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
vn AS (
  SELECT vec_id,
         CASE WHEN list_dot_product(v, v) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS u
  FROM vecs),{_kmeans_chain(_IVF_TRAIN_ITERS)},
assign AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(u, cv) DESC, cid) AS rn
  FROM vn CROSS JOIN cents{n_it}),
cells AS (
  SELECT a.vec_id, v.v, a.cid AS cell
  FROM assign a JOIN vecs v ON v.vec_id = a.vec_id
  WHERE a.rn = 1)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
  FROM cells a JOIN cells b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE sqrt(list_dot_product(a.v, a.v))
        * sqrt(list_dot_product(b.v, b.v)) > 0) t
WHERE cos_sim >= 0.3"""

    # pq_adc_topk oracle: per-subspace Euclidean k-means IS SQL-expressible
    # the same way the IVF oracle is — the seed-11 codebook init is inlined
    # as literals, each Lloyd iteration is a CTE stage over (vec_id, j)
    # subvectors (assignment = argmin of the SAME expansion the trainer
    # computes, -2·s·c + ‖c‖², ties → lowest code; update = per-(j, code)
    # Euclidean mean, empty cells keep the previous centroid), and the ADC
    # phase joins the final assignment to a per-(j, code) query-distance
    # LUT. All float64 both sides; assignment margins dwarf summation-order
    # drift (same argument as ann_ivf_trained_topk).
    from nextsearch_api_spark.operators.similarity import pq_codebooks
    _pq_m, _pq_k, _pq_dim = 4, 16, 64
    _pq_dsub = _pq_dim // _pq_m
    PB = pq_codebooks(_pq_dim, _pq_m, _pq_k, seed=11)
    pq_rows = ",\n    ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            j, c, ", ".join(repr(float(x)) for x in PB[j][c]))
        for j in range(_pq_m) for c in range(_pq_k)
    )
    pq_iters = []
    for it in range(1, _PQ_TRAIN_ITERS + 1):
        p = it - 1
        pq_iters.append(f"""
pa{it} AS (
  SELECT vec_id, j, s, cid,
         row_number() OVER (PARTITION BY vec_id, j
                            ORDER BY -2 * list_dot_product(s, cv)
                                     + list_dot_product(cv, cv), cid) AS rn
  FROM sub JOIN pqc{p} c USING (j)),
pm{it} AS (
  SELECT j, cid, dim, avg(s[dim]) AS mx
  FROM (SELECT j, s, cid FROM pa{it} WHERE rn = 1) t
  CROSS JOIN (SELECT unnest(generate_series(1, {_pq_dsub})) AS dim) d
  GROUP BY 1, 2, 3),
pv{it} AS (SELECT j, cid, list(mx ORDER BY dim) AS mv FROM pm{it} GROUP BY 1, 2),
pqc{it} AS (
  SELECT c.j, c.cid, coalesce(s.mv, c.cv) AS cv
  FROM pqc{p} c LEFT JOIN pv{it} s ON s.j = c.j AND s.cid = c.cid)""")
    pq_chain = ",".join(pq_iters)
    pq_n = _PQ_TRAIN_ITERS
    sql["pq_adc_topk"] = f"""
WITH pqc0(j, cid, cv) AS (VALUES
    {pq_rows}),
vecs AS (SELECT vec_id,
                list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings),
vn AS (
  SELECT vec_id,
         CASE WHEN list_dot_product(v, v) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS u
  FROM vecs WHERE vec_id <> 0),
js AS (SELECT unnest(generate_series(0, {_pq_m - 1})) AS j),
sub AS (SELECT vec_id, j,
               u[j * {_pq_dsub} + 1 : (j + 1) * {_pq_dsub}] AS s
        FROM vn CROSS JOIN js),{pq_chain},
codes AS (
  SELECT vec_id, j, cid FROM (
    SELECT vec_id, j, cid,
           row_number() OVER (PARTITION BY vec_id, j
                              ORDER BY -2 * list_dot_product(s, cv)
                                       + list_dot_product(cv, cv), cid) AS rn
    FROM sub JOIN pqc{pq_n} c USING (j)) t WHERE rn = 1),
q AS (
  SELECT CASE WHEN list_dot_product(v, v) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS qu
  FROM vecs WHERE vec_id = 0),
qsub AS (SELECT j, qu[j * {_pq_dsub} + 1 : (j + 1) * {_pq_dsub}] AS qs
         FROM q CROSS JOIN js),
lut AS (
  SELECT c.j, c.cid,
         list_dot_product(list_transform(cv, (x, i) -> x - qs[i]),
                          list_transform(cv, (x, i) -> x - qs[i])) AS d
  FROM pqc{pq_n} c JOIN qsub USING (j)),
dists AS (
  SELECT vec_id, sum(d) AS dist
  FROM codes JOIN lut USING (j, cid) GROUP BY 1)
SELECT rank, vec_id, adc_cos FROM (
  SELECT vec_id,
         round(1.0 - dist / 2, 9) AS cr,
         round(1.0 - dist / 2, 6) AS adc_cos,
         row_number() OVER (ORDER BY round(1.0 - dist / 2, 9) DESC, vec_id)
           AS rank
  FROM dists) t
WHERE rank <= 10"""

    sql["cosine_topk"] = """
WITH q AS (SELECT list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id,
         list_dot_product(list_transform(e.embedding, x -> cast(x AS DOUBLE)), q.qv)
         / (sqrt(list_dot_product(list_transform(e.embedding, x -> cast(x AS DOUBLE)),
                                  list_transform(e.embedding, x -> cast(x AS DOUBLE))))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
SELECT rank, vec_id, round(cos, 6) AS cos_sim FROM (
  SELECT vec_id, cos,
         row_number() OVER (ORDER BY round(cos, 9) DESC, vec_id) AS rank
  FROM sims) t
WHERE rank <= 10"""

    # cosine_topk_batch oracle: the single-query sims CTE generalized to a
    # 3-row query relation; same round-9 order key + round-6 output
    sql["cosine_topk_batch"] = """
WITH q AS (SELECT vec_id AS qid,
                  list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 3),
sims AS (
  SELECT q.qid, e.vec_id,
         list_dot_product(list_transform(e.embedding, x -> cast(x AS DOUBLE)), q.qv)
         / (sqrt(list_dot_product(list_transform(e.embedding, x -> cast(x AS DOUBLE)),
                                  list_transform(e.embedding, x -> cast(x AS DOUBLE))))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM embeddings e CROSS JOIN q)
SELECT qid, rank, vec_id, round(cos, 6) AS cos_sim FROM (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(cos, 9) DESC, vec_id) AS rank
  FROM sims) t
WHERE rank <= 10"""

    # hybrid fusion oracles: the two component queries nest verbatim
    # (DuckDB allows WITH inside subqueries); RRF = sum of w/(k+rank) over
    # the lists, linear = sum of w * min-max-normalized score. 1.0::DOUBLE
    # etc. — bare 1.0 is DECIMAL in DuckDB and decimal division would
    # diverge from Spark's float64 arithmetic.
    sql["hybrid_rrf_topk"] = f"""
WITH lex AS (SELECT doc_id, rank FROM ({topk_sql}) WHERE qid = 2),
vec AS (SELECT vec_id AS doc_id, rank FROM ({sql["cosine_topk"]})),
u AS (
  SELECT doc_id, (1.0::DOUBLE) / (60.0::DOUBLE + rank) AS s FROM lex
  UNION ALL
  SELECT doc_id, (1.0::DOUBLE) / (60.0::DOUBLE + rank) FROM vec),
f AS (SELECT doc_id, sum(s) AS sc, count(*)::BIGINT AS n_lists
      FROM u GROUP BY 1)
SELECT rank, doc_id, round(sc, 6) AS rrf_score, n_lists FROM (
  SELECT doc_id, sc, n_lists,
         row_number() OVER (ORDER BY round(sc, 9) DESC, doc_id) AS rank
  FROM f) t
WHERE rank <= 10"""

    sql["hybrid_linear_topk"] = f"""
WITH lex AS (SELECT doc_id, score::DOUBLE AS score
             FROM ({topk_sql}) WHERE qid = 2),
vec AS (SELECT vec_id AS doc_id, cos_sim::DOUBLE AS score
        FROM ({sql["cosine_topk"]})),
lmm AS (SELECT min(score) AS mn, max(score) AS mx FROM lex),
vmm AS (SELECT min(score) AS mn, max(score) AS mx FROM vec),
u AS (
  SELECT doc_id, (0.5::DOUBLE) * (CASE WHEN mx > mn
         THEN (score - mn) / (mx - mn) ELSE 1.0::DOUBLE END) AS s
  FROM lex, lmm
  UNION ALL
  SELECT doc_id, (0.5::DOUBLE) * (CASE WHEN mx > mn
         THEN (score - mn) / (mx - mn) ELSE 1.0::DOUBLE END)
  FROM vec, vmm),
f AS (SELECT doc_id, sum(s) AS sc, count(*)::BIGINT AS n_lists
      FROM u GROUP BY 1)
SELECT rank, doc_id, round(sc, 6) AS fused_score, n_lists FROM (
  SELECT doc_id, sc, n_lists,
         row_number() OVER (ORDER BY round(sc, 9) DESC, doc_id) AS rank
  FROM f) t
WHERE rank <= 10"""

    # mmr_rerank oracle: the greedy loop unrolled as one CTE stage per pick
    # (the kmeans-chain pattern) — pick i = argmax over the remaining
    # candidates of 0.5*score - 0.5*max cos to the selected set s{i-1},
    # round-9 tie-broken by vec_id, exactly the operator's rule. lam=0.5 so
    # both constants are exact doubles.
    def _mmr_chain(n_picks: int) -> "tuple[str, str]":
        """(pick-CTE chain, rank-union select) for the unrolled MMR greedy
        over a ``cand(vec_id, score, u)`` CTE — one stage per pick (the
        kmeans-chain pattern): pick i = argmax over the remaining
        candidates of 0.5*score - 0.5*max cos to the selected set s{i-1},
        round-9 tie-broken by vec_id, exactly the operator's rule. lam=0.5
        so both constants are exact doubles. Shared by the mmr_rerank and
        retrieval_pipeline oracles."""
        picks, outs = [], []
        for i in range(1, n_picks + 1):
            if i == 1:
                picks.append("""
p1 AS MATERIALIZED (
  SELECT vec_id, u, (0.5::DOUBLE) * score AS obj FROM cand
  ORDER BY round((0.5::DOUBLE) * score, 9) DESC, vec_id LIMIT 1),
s1 AS MATERIALIZED (SELECT vec_id, u FROM p1)""")
            else:
                picks.append(f"""
p{i} AS MATERIALIZED (
  SELECT vec_id, u, obj FROM (
    SELECT c.vec_id, c.u,
           (0.5::DOUBLE) * c.score
           - (0.5::DOUBLE) * (SELECT max(list_dot_product(c.u, s.u))
                              FROM s{i - 1} s) AS obj
    FROM cand c
    WHERE c.vec_id NOT IN (SELECT vec_id FROM s{i - 1})) t
  ORDER BY round(obj, 9) DESC, vec_id LIMIT 1),
s{i} AS MATERIALIZED (SELECT vec_id, u FROM s{i - 1}
         UNION ALL SELECT vec_id, u FROM p{i})""")
            outs.append(
                f"SELECT {i} AS rank, vec_id, round(obj, 6) AS mmr_score "
                f"FROM p{i}")
        return ",".join(picks), " UNION ALL ".join(outs)

    # cosine top-20 candidates with unit vectors, shared by both MMR oracles
    _MMR_CAND = """
q AS (SELECT list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
ev AS (SELECT vec_id,
              list_transform(embedding, x -> cast(x AS DOUBLE)) AS v
       FROM embeddings WHERE vec_id <> 0),
sims AS (
  SELECT e.vec_id, e.v,
         list_dot_product(e.v, q.qv)
         / (sqrt(list_dot_product(e.v, e.v))
            * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM ev e CROSS JOIN q),
cand AS MATERIALIZED (
  SELECT vec_id, round(cos, 6) AS score,
         CASE WHEN sqrt(list_dot_product(v, v)) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS u
  FROM (SELECT vec_id, v, cos,
               row_number() OVER (ORDER BY round(cos, 9) DESC, vec_id) AS rnk
        FROM sims) t
  WHERE rnk <= 20)"""

    mmr_picks5, mmr_out5 = _mmr_chain(5)
    sql["mmr_rerank"] = f"""
WITH {_MMR_CAND},{mmr_picks5}
{mmr_out5}"""

    # retrieval_pipeline oracle (composed end-to-end gate): cosine top-20 →
    # MMR 10 picks → RRF with the BM25 qid=2 list → top-10. Catches
    # cross-operator schema/rank drift no per-stage oracle can see (the
    # curation_pipeline pattern applied to the retrieval tier).
    mmr_picks10, mmr_out10 = _mmr_chain(10)
    sql["retrieval_pipeline"] = f"""
WITH {_MMR_CAND},{mmr_picks10},
mmr AS ({mmr_out10}),
lex AS (SELECT doc_id, rank FROM ({sql["bm25_topk"]}) WHERE qid = 2),
vecr AS (SELECT vec_id AS doc_id, rank FROM mmr),
u AS (
  SELECT doc_id, (1.0::DOUBLE) / (60.0::DOUBLE + rank) AS s FROM lex
  UNION ALL
  SELECT doc_id, (1.0::DOUBLE) / (60.0::DOUBLE + rank) FROM vecr),
f AS (SELECT doc_id, sum(s) AS sc, count(*)::BIGINT AS n_lists
      FROM u GROUP BY 1)
SELECT rank, doc_id, round(sc, 6) AS rrf_score, n_lists FROM (
  SELECT doc_id, sc, n_lists,
         row_number() OVER (ORDER BY round(sc, 9) DESC, doc_id) AS rank
  FROM f) t
WHERE rank <= 10"""

    # ann_recall oracle: the per-method SQL composed — intersection size of
    # each ANN top-10 with the exact cosine top-10 (DuckDB allows WITH
    # inside subqueries, so each component query nests verbatim)
    sql["ann_recall"] = f"""
SELECT 'ivf_trained' AS method, count(*)::BIGINT AS hits,
       round(count(*) / 10.0, 6) AS recall_at_10
FROM ({sql["ann_ivf_trained_topk"]}) a
JOIN ({sql["cosine_topk"]}) e USING (vec_id)
UNION ALL
SELECT 'lsh', count(*)::BIGINT, round(count(*) / 10.0, 6)
FROM ({sql["ann_lsh_topk"]}) a
JOIN ({sql["cosine_topk"]}) e USING (vec_id)
UNION ALL
SELECT 'pq', count(*)::BIGINT, round(count(*) / 10.0, 6)
FROM ({sql["pq_adc_topk"]}) a
JOIN ({sql["cosine_topk"]}) e USING (vec_id)"""

    sql["label_centroid_norm"] = """
WITH e AS (
  SELECT label, dim, cast(embedding[dim + 1] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d),
cent AS (SELECT label, dim, avg(v) AS c FROM e GROUP BY 1, 2)
SELECT label, round(sqrt(sum(c * c)), 6) AS centroid_norm
FROM cent GROUP BY 1"""

    # gaps-and-islands twin of the Spark window construction; (ts, event_id)
    # is the deterministic order key on both sides
    sql["user_sessions_batch"] = """
WITH brk AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
              ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM brk)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, sess_id"""

    # events_asof oracle: DuckDB's native ASOF LEFT JOIN — exactly the
    # semantics the union+window operator implements (latest right row with
    # right.ts <= left.ts per key; NULL where no prior row)
    sql["events_asof"] = """
WITH l AS (SELECT user_id, ts, event_id, round(value, 6) AS value
           FROM events WHERE event_id % 2 = 1),
r AS (SELECT user_id, ts, round(max(value), 6) AS ref_value
      FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2)
SELECT l.user_id, strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       l.event_id, l.value, r.ref_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""

    # events_sliding oracle: fan each event to its two epoch-aligned
    # 2h/1h-slide windows (date_trunc(hour) and one hour earlier), group
    sql["events_sliding"] = """
WITH w AS (
  SELECT event_type, value,
         date_trunc('hour', ts) - to_hours(k) AS win_start
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks)
SELECT event_type,
       strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value
FROM w GROUP BY 1, 2"""

    # event_quantiles oracle: quantile_cont == Spark's exact `percentile`
    # (both interpolate linearly at p·(n−1))
    sql["event_quantiles"] = """
SELECT event_type, count(*)::BIGINT AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY 1"""

    # snippets oracle: strpos/locate are both 1-based, substring
    # semantics match; DuckDB regexp_replace needs the 'g' flag (Spark
    # replaces all by default) and \\1 instead of $1
    _SNIP_TERMS = ["batch", "spark", "window"]
    _snip_pos = ", ".join(
        f"CASE WHEN strpos(lt, '{t}') > 0 THEN strpos(lt, '{t}')"
        f" ELSE 1073741824 END" for t in _SNIP_TERMS)
    sql["snippets"] = f"""
WITH t AS (SELECT doc_id, text, lower(text) AS lt FROM documents),
p AS (SELECT doc_id, text, least({_snip_pos}) AS fp FROM t)
SELECT doc_id, fp::BIGINT AS first_pos,
       regexp_replace(substring(text, greatest(1, fp - 30), 60),
                      '(?i)({"|".join(_SNIP_TERMS)})', '**\\1**', 'g')
       AS snippet
FROM p WHERE fp < 1073741824"""

    # phrase oracles: same raw tokenizer + 1-based sliding-window count;
    # DuckDB's generate_series(1, n<=0) is already empty so only Spark
    # needs the size guard. Overlapping occurrences count on both sides.
    def _phrase_match_sql(toks: "list[str]") -> str:
        m = len(toks)
        cond = " AND ".join(f"toks[i + {j}] = '{t}'"
                            for j, t in enumerate(toks))
        return f"""
SELECT doc_id, n_occurrences FROM (
  SELECT doc_id,
         len(list_filter(generate_series(1, len(toks) - {m} + 1),
             i -> {cond}))::BIGINT AS n_occurrences
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents) t) m
WHERE n_occurrences > 0"""

    sql["phrase_match"] = _phrase_match_sql(["table", "table"])
    # the index-accelerated path must be rank-identical to the scan oracle
    sql["phrase_topk"] = sql["engine_phrase_topk"] = f"""
SELECT rank, doc_id, n_occurrences FROM (
  SELECT doc_id, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, doc_id) AS rank
  FROM ({_phrase_match_sql(["fast", "table"])}) m) t
WHERE rank <= 10"""

    # events_dedup_batch oracle: delivery dedup of identical redelivered
    # rows recovers the original table exactly
    sql["events_dedup_batch"] = """
SELECT event_id, ts, user_id, event_type, round(value, 6) AS value
FROM events"""

    sql["events_hourly"] = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""

    return sql
