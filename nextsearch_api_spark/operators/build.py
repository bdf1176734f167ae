"""Index build pipeline — Spark-first inverted-index construction.

Reference semantics being reproduced (SURVEY.md §3.3): forwardindex →
lexicon → segment files, i.e. tokenize + per-doc tf (src/ForwardIndex.cpp:
141-151), invert by term (src/lexicon.cpp:62-72), postings sorted by doc_id
(lexicon.cpp:108-109), df = posting count (lexicon.cpp:111), term-space
partitioning (the 64 "barrels", include/barrels.hpp:12,42-47), global stats
N/avgdl (ForwardIndex.cpp:187).

Spark-first re-design (NOT a port):
  * doc_id assignment — dense, deterministic ``row_number() over (order by
    repo, path, commit)`` computed WITHOUT a single-partition window: keys are
    bucketed by sampled range bounds (deterministic given the seed), per-bucket
    counts give global offsets, a mapInPandas pass adds bucket-local positions.
    Scales to any corpus size; no driver bottleneck.
  * tokenize+tf — one Arrow-batched mapInPandas pass emitting unique
    (doc_id, term, tf, doc_len) rows directly: the per-doc tf aggregation is
    local to the doc, so there is NO shuffle for the tf hash-agg at all
    (map-side perfect combine; beats explode→groupBy).
  * invert — ``repartitionByRange(term, doc_id)``: the range partitioner
    samples the key distribution, so a super-hot term's postings are split
    ACROSS partitions automatically (explicit skew handling; the salting
    analog with ordered ranges instead of random salt, which keeps postings
    globally sorted for free). Each partition then emits independent,
    disjoint, doc-ordered CHUNKS of ≤ chunk_size postings — no giant
    collect_list, bounded memory per task regardless of term skew.
  * postings format — per chunk: delta+varbyte blob (doc gaps, tf, doc_len),
    skip docs every ``skip_every`` postings, float32 block-max impact
    (tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl)) upper bound for WAND).
  * every stage materializes to Parquet and checkpoints via the lineage
    manifest (plans/checkpoint.py) — resume skips completed stages.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from nextsearch_api_spark.config import BuildConfig, IndexPaths
from nextsearch_api_spark.functions.text import kept_tokens_expr
from nextsearch_api_spark.plans.checkpoint import BuildManifest, StageRunner

TOKENS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("term", StringType(), False),
    StructField("tf", IntegerType(), False),
    StructField("doc_len", IntegerType(), False),
])

POSTINGS_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_lo", LongType(), False),
    StructField("doc_hi", LongType(), False),
    StructField("count", IntegerType(), False),
    StructField("sum_tf", LongType(), False),
    StructField("max_tf", IntegerType(), False),
    StructField("max_impact", FloatType(), False),
    StructField("tf_off", IntegerType(), False),
    StructField("dl_off", IntegerType(), False),
    StructField("blob", BinaryType(), False),
    StructField("skip_docs", ArrayType(LongType(), False), False),
])

_KEY_SEP = "\x01"


# ---------------------------------------------------------------- doc ids --

def assign_doc_ids(corpus: DataFrame, n_buckets: int | None = None,
                   seed: int = 42) -> DataFrame:
    """Dense deterministic doc_id = global rank of (repo, path, commit).

    Equivalent to ``row_number() over (order by repo, path, commit)``
    (FIXTURES.md §4) but distributed: sampled range bounds → bucket →
    per-bucket offsets → bucket-local position. doc_id is 1-based.
    """
    spark = corpus.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    B = n_buckets or shuffle_p
    keyed = corpus.withColumn(
        "_key", F.concat_ws(_KEY_SEP, "repo", "path", "commit")
    )

    n = keyed.count()
    if n == 0:
        return keyed.drop("_key").withColumn("doc_id", F.lit(0).cast("long"))
    B = max(1, min(B, math.ceil(n / 16)))

    bounds: list[str] = []
    if B > 1:
        frac = min(1.0, (B * 64.0) / n)
        sample = sorted(
            r[0] for r in keyed.select("_key").sample(False, frac, seed).collect()
        )
        if sample:
            raw = [sample[(len(sample) * i) // B] for i in range(1, B)]
            bounds = sorted(set(raw))

    # bucket = count of bounds < key (== searchsorted-left) — a pure JVM
    # expression over a literal array: no Python workers anywhere in the
    # assignment, everything stays inside whole-stage codegen.
    if bounds:
        barr = F.array(*[F.lit(x) for x in bounds])
        bucket_col = F.size(F.filter(barr, lambda x: x < F.col("_key")))
    else:
        bucket_col = F.lit(0)
    keyed = keyed.withColumn("_bucket", bucket_col.cast("int"))

    # pass 1: per-bucket counts (column-pruned scan, tiny aggregate)
    counts = {r["_bucket"]: r["cnt"]
              for r in keyed.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()}
    offsets: list[tuple[int, int]] = []
    acc = 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_bucket int, _offset long")
    )

    # pass 2: one shuffle by bucket; per-bucket row_number is a window over
    # the bucket partition — JVM sort + codegen, no Python
    in_cols = [f.name for f in corpus.schema.fields]
    from pyspark.sql import Window
    w = Window.partitionBy("_bucket").orderBy("_key")
    return (
        keyed.join(off_df, "_bucket")
        .withColumn("doc_id", (F.col("_offset") + F.row_number().over(w)).cast("long"))
        .select(*in_cols, "doc_id")
    )


# ---------------------------------------------------------------- tokenize --

def tokenize_tf(corpus_ids: DataFrame, tokenizer: str = "pandas") -> DataFrame:
    """(doc_id, term, tf, doc_len) — unique per (doc_id, term); zero-token
    docs are dropped (reference: src/ForwardIndex.cpp:152)."""
    if tokenizer == "sql":
        toks = corpus_ids.select(
            "doc_id", kept_tokens_expr("content").alias("toks")
        ).withColumn("doc_len", F.size("toks")).where(F.col("doc_len") > 0)
        return (
            toks.select("doc_id", "doc_len", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("int").alias("tf"),
                 F.first("doc_len").cast("int").alias("doc_len"))
            .select("doc_id", "term", "tf", "doc_len")
        )

    def tok(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        from nextsearch_api_spark.functions.text import STOPWORDS
        sw = np.array(STOPWORDS, dtype=object)
        for pdf in batches:
            # C-backed extraction; everything after is pure NumPy — the only
            # per-doc Python is the findall list materialization
            lists = pdf["content"].fillna("").str.lower().str.findall(r"[a-z0-9]{2,}")
            lens = lists.str.len().to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                continue
            flat = pd.Series(np.concatenate([np.array(x, dtype=object)
                                             for x in lists if x]))
            local = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            keep = ~flat.isin(sw).to_numpy()
            flat = flat[keep]
            local = local[keep]
            # NOTE [a-z0-9]{2,} == findall('[a-z0-9]+') + len>=2 filter: a
            # shorter run is a maximal run, so requiring 2+ inside the regex
            # drops exactly the len<2 tokens (tests/test_text.py proves parity)
            codes, uniques = pd.factorize(flat, sort=False)
            nu = len(uniques)
            combo = local * nu + codes
            uc, cnt = np.unique(combo, return_counts=True)
            did_local = (uc // nu).astype(np.int64)
            term_code = (uc % nu).astype(np.int64)
            doc_lens = np.bincount(local, minlength=len(pdf)).astype(np.int32)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64)[did_local],
                "term": np.asarray(uniques, dtype=object)[term_code],
                "tf": cnt.astype(np.int32),
                "doc_len": doc_lens[did_local],
            })

    return corpus_ids.select("doc_id", "content").mapInPandas(
        tok, schema=TOKENS_SCHEMA
    )


# ----------------------------------------------------------------- chunks --

def build_posting_chunks(tokens: DataFrame, avgdl: float, cfg: BuildConfig,
                         partitions: int | None = None) -> DataFrame:
    """tokens (doc_id, term, tf, doc_len) → chunked, compressed posting rows.

    Range-partition by (term, doc_id): hot terms straddle partition
    boundaries, giving disjoint doc-ranges per partition — each partition emits
    its own chunks, naturally skew-split, memory bounded by chunk_size."""
    spark = tokens.sparkSession
    P = partitions or cfg.postings_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    k1 = np.float32(cfg.bm25.k1)
    b = np.float32(cfg.bm25.b)
    one = np.float32(1.0)
    avgdl32 = np.float32(avgdl)
    chunk_size = cfg.chunk_size
    skip_every = cfg.skip_every

    from nextsearch_api_spark.functions.codec import encode_chunk

    def emit_chunks(pdf: "pd.DataFrame", complete_only: bool):  # noqa: F821
        """Yield (chunk_rows, leftover_pdf). pdf sorted by (term, doc_id)."""
        import pandas as pd
        rows = []
        terms = pdf["term"].to_numpy()
        n = len(terms)
        starts = np.nonzero(np.concatenate(([True], terms[1:] != terms[:-1])))[0]
        ends = np.concatenate((starts[1:], [n]))
        leftover = None
        for s, e in zip(starts, ends):
            is_last_term = e == n
            pos = s
            while pos < e:
                hi = min(pos + chunk_size, e)
                if complete_only and is_last_term and (e - pos) < chunk_size:
                    leftover = pdf.iloc[pos:e]
                    break
                sl = pdf.iloc[pos:hi]
                doc_ids = sl["doc_id"].to_numpy(dtype=np.int64)
                tfs = sl["tf"].to_numpy(dtype=np.int64)
                dls = sl["doc_len"].to_numpy(dtype=np.int64)
                blob, tf_off, dl_off = encode_chunk(doc_ids, tfs, dls)
                tf32 = tfs.astype(np.float32)
                dl32 = dls.astype(np.float32)
                imp = tf32 * (k1 + one) / (tf32 + k1 * (one - b + b * (dl32 / avgdl32)))
                rows.append({
                    "term": terms[s],
                    "doc_lo": int(doc_ids[0]),
                    "doc_hi": int(doc_ids[-1]),
                    "count": int(len(doc_ids)),
                    "sum_tf": int(tfs.sum()),
                    "max_tf": int(tfs.max()),
                    "max_impact": float(np.float32(imp.max())),
                    "tf_off": tf_off,
                    "dl_off": dl_off,
                    "blob": blob,
                    "skip_docs": doc_ids[::skip_every].tolist(),
                })
                pos = hi
            if leftover is not None:
                break
        return rows, leftover

    def builder(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd
        buf: "pd.DataFrame | None" = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            rows, buf = emit_chunks(pdf, complete_only=True)
            if rows:
                yield pd.DataFrame(rows)
        if buf is not None and len(buf):
            rows, _ = emit_chunks(buf, complete_only=False)
            if rows:
                yield pd.DataFrame(rows)

    return (
        tokens.repartitionByRange(P, "term", "doc_id")
        .sortWithinPartitions("term", "doc_id")
        .mapInPandas(builder, schema=POSTINGS_SCHEMA)
    )


# ------------------------------------------------------------------ build --

def build_index(spark: SparkSession, corpus: DataFrame, out_root: str,
                cfg: BuildConfig | None = None, resume: bool = True) -> dict:
    """Full resumable build. Returns the stage-metrics dict."""
    cfg = cfg or BuildConfig()
    paths = IndexPaths(out_root)
    os.makedirs(out_root, exist_ok=True)
    manifest = BuildManifest.load(paths.manifest) if resume else BuildManifest(
        paths.manifest, {"stages": {}, "created_at": time.time()}
    )
    base_fp = {
        "chunk_size": cfg.chunk_size, "skip_every": cfg.skip_every,
        "k1": cfg.bm25.k1, "b": cfg.bm25.b, "tokenizer": cfg.tokenizer,
        "corpus": _corpus_fingerprint(corpus),
    }
    runner = StageRunner(manifest, base_fp)

    ids_path = os.path.join(out_root, "ids")
    forward_path = os.path.join(out_root, "forward")

    def stage_ids() -> dict:
        # One corpus pass: deterministic ids + content hashes, materialized so
        # every later stage column-prunes what it needs (content only read by
        # the forward tokenizer) and resume never re-runs the assignment.
        ids = assign_doc_ids(corpus, cfg.id_partitions).select(
            "doc_id",
            F.substring(
                F.sha2(F.concat_ws("", "repo", "path", "commit"), 256), 1, 16
            ).alias("uid"),
            "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256).alias("content_sha256"),
            "content",
        )
        ids.write.mode("overwrite").parquet(ids_path)
        return {"rows": spark.read.parquet(ids_path).count()}

    runner.run("ids", stage_ids, output=ids_path)

    def stage_forward() -> dict:
        ids = spark.read.parquet(ids_path)
        tokens = tokenize_tf(ids, cfg.tokenizer)
        tokens.write.mode("overwrite").parquet(forward_path)
        return {"rows": spark.read.parquet(forward_path).count()}

    runner.run("forward", stage_forward, output=forward_path)

    def stage_docs() -> dict:
        doc_lens = (
            spark.read.parquet(forward_path)
            .groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))
        )
        docs = (
            spark.read.parquet(ids_path).drop("content")
            # inner join drops zero-token docs, mirroring the reference
            # (src/ForwardIndex.cpp:152 skips empty docs entirely)
            .join(doc_lens, "doc_id", "inner")
            .select("doc_id", "uid", "repo", "path", "commit", "lang",
                    "doc_len", "content_sha256")
        )
        docs.write.mode("overwrite").parquet(paths.docs)
        return {"rows": spark.read.parquet(paths.docs).count()}

    runner.run("docs", stage_docs, output=paths.docs)

    def stage_stats() -> dict:
        docs = spark.read.parquet(paths.docs)
        row = docs.agg(
            F.count("*").alias("N"), F.sum("doc_len").alias("total_len")
        ).collect()[0]
        N = int(row["N"])
        avgdl = float(row["total_len"]) / N if N else 0.0
        stats = {"N": N, "avgdl": avgdl, "total_len": int(row["total_len"] or 0),
                 "k1": cfg.bm25.k1, "b": cfg.bm25.b, "built_at": time.time()}
        with open(paths.stats, "w") as f:
            json.dump(stats, f, indent=2)
        return {"rows": N}

    runner.run("stats", stage_stats, output=paths.stats)

    with open(paths.stats) as f:
        stats = json.load(f)

    def stage_postings() -> dict:
        tokens = spark.read.parquet(forward_path)
        chunks = build_posting_chunks(tokens, stats["avgdl"], cfg)
        chunks.write.mode("overwrite").parquet(paths.postings)
        return {"rows": spark.read.parquet(paths.postings).count()}

    runner.run("postings", stage_postings, output=paths.postings)

    def stage_lexicon() -> dict:
        postings = spark.read.parquet(paths.postings)
        lex = (
            postings.groupBy("term").agg(
                F.sum("count").cast("long").alias("df"),
                F.sum("sum_tf").cast("long").alias("cf"),
                F.count("*").cast("int").alias("n_chunks"),
                F.max("max_impact").alias("max_impact"),
            )
        )
        # range-partition + sort by term → parquet min/max footer stats give
        # term-lookup pruning (the reference's barrel/offset seek analog)
        lp = max(1, min(64, lex.rdd.getNumPartitions()))
        (lex.repartitionByRange(lp, "term").sortWithinPartitions("term")
            .write.mode("overwrite").parquet(paths.lexicon))
        return {"rows": spark.read.parquet(paths.lexicon).count()}

    runner.run("lexicon", stage_lexicon, output=paths.lexicon)

    if cfg.build_suggest:
        def stage_suggest() -> dict:
            from nextsearch_api_spark.operators.autocomplete import build_suggest
            lex = spark.read.parquet(paths.lexicon)
            sug = build_suggest(lex)
            sug.write.mode("overwrite").parquet(paths.suggest)
            return {"rows": spark.read.parquet(paths.suggest).count()}

        runner.run("suggest", stage_suggest, output=paths.suggest)

    manifest.data["completed_at"] = time.time()
    manifest.save()
    return runner.metrics


def _corpus_fingerprint(corpus: DataFrame) -> str:
    """Cheap input fingerprint for resume decisions: source files if the plan
    is a file scan, else the logical plan string."""
    try:
        files = sorted(corpus.inputFiles())
        if files:
            return "files:" + ",".join(files)
    except Exception:
        pass
    return "plan:" + corpus._jdf.queryExecution().logical().toString()  # noqa: SLF001
