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
  * tokenize+tf — one Arrow-native mapInArrow pass emitting unique
    (doc_id, term, tf, doc_len) rows directly: the per-doc tf aggregation is
    local to the doc, so there is NO shuffle for the tf hash-agg at all
    (map-side perfect combine; beats explode→groupBy), and tokenization runs
    entirely in Arrow C kernels.
  * invert — hash-repartition by (term, doc_id div doc_block): a
    DETERMINISTIC doc-range salt. A super-hot term's postings are split
    ACROSS partitions (explicit skew handling) while each (term, block) stays
    whole, so every partition emits independent, disjoint, doc-ordered CHUNKS
    of ≤ chunk_size postings — no giant collect_list, bounded memory per task
    regardless of term skew, no range-partitioner sampling pass, and a
    run-to-run reproducible physical layout.
  * postings format — per chunk: delta+varbyte blob (doc gaps, tf, doc_len),
    float32 block-max impact
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
    StructField("min_dl", IntegerType(), False),
    StructField("max_impact", FloatType(), False),
    StructField("tf_off", IntegerType(), False),
    StructField("dl_off", IntegerType(), False),
    StructField("blob", BinaryType(), False),
])

_KEY_SEP = "\x01"

# bump when the on-disk chunk/lexicon format changes — forces resume logic to
# rebuild indexes created by older code
FORMAT_VERSION = 4


def _parquet_rows(path: str) -> int:
    """Row count from Parquet footers only — no Spark job."""
    import pyarrow.dataset as ds
    return ds.dataset(path).count_rows()


def _fast_count(df: DataFrame) -> int:
    """Row-count estimate for sampling decisions: Parquet/ORC footer
    metadata when the plan is a straight file scan (an over-estimate is
    harmless for the sample fraction), else a count job."""
    try:
        files = df.inputFiles()
        if files and all(f.endswith(".parquet") for f in files):
            import pyarrow.dataset as ds
            return ds.dataset([f.replace("file:", "") for f in files]).count_rows()
        if files and all(f.endswith(".orc") for f in files):
            from pyarrow import orc
            return sum(orc.ORCFile(f.replace("file:", "")).nrows
                       for f in files)
    except Exception:
        pass
    return df.count()


# ---------------------------------------------------------------- doc ids --

# keys-collect fast path bound: below this row count the (repo,path,commit)
# keys come to the driver in ONE column-pruned Arrow collect (~60 B/key →
# ≤ ~120 MB) and bounds + bucket counts are computed there; above it the
# two-job distributed path (sample, then counts) runs — the only shape that
# works at 10^9+ rows.
DRIVER_KEYS_MAX = 2_000_000


def assign_doc_ids(corpus: DataFrame, n_buckets: int | None = None,
                   seed: int = 42,
                   driver_keys_max: int = DRIVER_KEYS_MAX) -> DataFrame:
    """Dense deterministic doc_id = global rank of (repo, path, commit).

    Equivalent to ``row_number() over (order by repo, path, commit)``
    (FIXTURES.md §4) but distributed: range bounds → bucket → per-bucket
    offsets → bucket-local position. doc_id is 1-based.

    Bounds + per-bucket counts come from ONE key collect when the corpus is
    small enough (``driver_keys_max``): exact equi-depth bounds and exact
    counts from the sorted keys, replacing two of the three corpus scans
    (the sample job and the counts job — measured 3.0 s of the 10.6 s
    8-core ids stage at 400k docs). Driver-side comparison is on UTF-8
    bytes, the same binary order Spark's UTF8String uses, so the
    driver-computed counts match the JVM bucket expression exactly. Larger
    corpora keep the fully distributed sample+count path.
    """
    spark = corpus.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # ≥4 tasks per core: with B == cores the id exchange is ONE wave of
    # fat window-sort tasks and any straggler extends the stage wall 1:1 —
    # measured 34.4 s → 23.9 s at 8 pinned cores (400k docs) by raising B
    # to 4× cores, while narrow widths are unchanged (waves already
    # amortize there). On a real cluster defaultParallelism is total
    # executor cores, so B keeps tracking cluster width.
    B = n_buckets or max(shuffle_p,
                         4 * spark.sparkContext.defaultParallelism)
    keyed = corpus.withColumn(
        "_key", F.concat_ws(_KEY_SEP, "repo", "path", "commit")
    )

    n = _fast_count(corpus)
    if n == 0:
        return keyed.drop("_key").withColumn("doc_id", F.lit(0).cast("long"))
    B = max(1, min(B, math.ceil(n / 16)))

    bounds: list[str] = []
    counts: dict[int, int] | None = None
    if B > 1 and n <= driver_keys_max:
        # one column-pruned Arrow collect; sort + split points run in Arrow
        # C kernels on UTF-8 binary (the same byte order Spark's UTF8String
        # compares with) — no Python string objects materialize
        import pyarrow as pa
        import pyarrow.compute as pc
        arr = (keyed.select("_key").toArrow().column(0)
               .combine_chunks().cast(pa.binary()))
        skeys = pc.take(arr, pc.sort_indices(arr))
        m = len(skeys)
        bkeys = sorted({skeys[(m * i) // B].as_py() for i in range(1, B)})

        def _right(v: bytes) -> int:  # first index with key > v
            lo, hi = 0, m
            while lo < hi:
                mid = (lo + hi) // 2
                if skeys[mid].as_py() <= v:
                    lo = mid + 1
                else:
                    hi = mid
            return lo

        # bucket(key) = #bounds strictly < key, so bucket i+1 starts at the
        # first key > bound_i → right-bisect split points
        edges = [0] + [_right(v) for v in bkeys] + [m]
        counts = {b: edges[b + 1] - edges[b]
                  for b in range(len(bkeys) + 1) if edges[b + 1] > edges[b]}
        bounds = [k.decode("utf-8") for k in bkeys]
    elif B > 1:
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

    # pass 1 (distributed path only): per-bucket counts (column-pruned scan,
    # tiny aggregate) — the keys-collect path already computed them exactly
    if counts is None:
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
    # the bucket partition — JVM sort + codegen, no Python.
    #
    # This exchange carries FULL corpus rows (content included) — a
    # deliberate, measured choice (VERDICT r2 #3). A keys-only variant
    # (window over (_key) alone → (key → doc_id) mapping → shuffle-hash join
    # back) was implemented and measured at 4.2 s vs 6.6 s for this stage
    # (400k docs, 8 pinned cores) — but its join output is hash(_key)-
    # scattered, so ids files no longer hold whole id buckets and the
    # NO-SHUFFLE postings builder's chunk-disjointness invariant breaks
    # (417k overlapping chunk ranges at 40k docs). Restoring contiguity
    # costs a second full-content exchange before tokenization, which is
    # strictly worse at scale: this plan moves content over the wire exactly
    # once for the entire build; the alternative moves it twice.
    in_cols = [f.name for f in corpus.schema.fields]
    from pyspark.sql import Window
    w = Window.partitionBy("_bucket").orderBy("_key")
    # ``seg`` = the id bucket. Buckets cover contiguous, disjoint doc-id
    # ranges by construction (cumulative offsets in bucket order) — the
    # segment-mode postings builder breaks chunks on seg boundaries so chunk
    # doc-ranges stay globally disjoint no matter how the shuffle places
    # buckets into output files or how the scan packs files into splits.
    # The window output keeps rows partitioned by bucket, so each ids file
    # holds whole buckets — the contiguity the postings builder relies on.
    return (
        keyed.join(off_df, "_bucket")
        .withColumn("doc_id", (F.col("_offset") + F.row_number().over(w)).cast("long"))
        .select(*in_cols, "doc_id", F.col("_bucket").alias("seg"))
    )


# ---------------------------------------------------------------- tokenize --

def tokenize_tf(corpus_ids: DataFrame, tokenizer: str = "arrow") -> DataFrame:
    """(doc_id, term, tf, doc_len) — unique per (doc_id, term); zero-token
    docs are dropped (reference: src/ForwardIndex.cpp:152).

    tokenizer='arrow' (default): everything — lower, regex split, length +
    stopword filter, dictionary encode — runs in Arrow C kernels via
    mapInArrow; the only NumPy work is the (doc, term) pair count. No Python
    string objects are ever materialized. 'pandas' and 'sql' variants kept
    for parity testing.
    """
    if tokenizer == "arrow":
        return _tokenize_tf_arrow(corpus_ids)
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


def append_doc_len(df: DataFrame) -> DataFrame:
    """Append a doc_len column (Arrow tokenize subset) to a DataFrame that
    carries (doc_id, content, ...) — all other columns pass through as Arrow
    buffers (no conversion cost)."""
    out_schema = StructType(df.schema.fields + [
        StructField("doc_len", IntegerType(), False)
    ])

    def app(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        from nextsearch_api_spark.functions.text import STOPWORDS
        sw = pa.array(list(STOPWORDS), type=pa.string())
        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch.column("content")), "[^a-z0-9]+")
            parent = pc.list_parent_indices(toks)
            flat = pc.list_flatten(toks)
            keep = pc.and_kleene(
                pc.greater_equal(pc.utf8_length(flat), 2),
                pc.invert(pc.is_in(flat, value_set=sw)),
            )
            parent = pc.filter(parent, keep)
            dl = np.bincount(parent.to_numpy(zero_copy_only=False),
                             minlength=batch.num_rows).astype(np.int32)
            yield batch.append_column("doc_len", pa.array(dl))

    return df.mapInArrow(app, schema=out_schema)


def doc_lengths(corpus_ids: DataFrame) -> DataFrame:
    """(doc_id, doc_len) via Arrow C kernels — the cheap subset of the
    tokenizer (split + filter + bincount; no dictionary encode, no tf)."""
    from pyspark.sql.types import StructType as _St

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("doc_len", IntegerType(), False),
    ])

    def lens(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        from nextsearch_api_spark.functions.text import STOPWORDS
        sw = pa.array(list(STOPWORDS), type=pa.string())
        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch.column("content")), "[^a-z0-9]+")
            parent = pc.list_parent_indices(toks)
            flat = pc.list_flatten(toks)
            keep = pc.and_kleene(
                pc.greater_equal(pc.utf8_length(flat), 2),
                pc.invert(pc.is_in(flat, value_set=sw)),
            )
            parent = pc.filter(parent, keep)
            dl = np.bincount(parent.to_numpy(zero_copy_only=False),
                             minlength=batch.num_rows).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(dl)],
                names=["doc_id", "doc_len"],
            )

    return corpus_ids.select("doc_id", "content").mapInArrow(lens, schema=schema)


def _tokenize_tf_arrow(corpus_ids: DataFrame) -> DataFrame:
    def tok(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        from nextsearch_api_spark.functions.text import STOPWORDS
        sw = pa.array(list(STOPWORDS), type=pa.string())
        for batch in batches:
            n_rows = batch.num_rows
            if n_rows == 0:
                continue
            content = batch.column("content")
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            toks = pc.split_pattern_regex(pc.utf8_lower(content), "[^a-z0-9]+")
            parent = pc.list_parent_indices(toks)
            flat = pc.list_flatten(toks)
            keep = pc.and_kleene(
                pc.greater_equal(pc.utf8_length(flat), 2),
                pc.invert(pc.is_in(flat, value_set=sw)),
            )
            flat = pc.filter(flat, keep)
            parent = pc.filter(parent, keep)
            if len(flat) == 0:
                continue
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = enc.dictionary
            local = parent.to_numpy(zero_copy_only=False).astype(np.int64)
            nu = len(vocab)
            combo = local * nu + codes
            uc, cnt = np.unique(combo, return_counts=True)
            did_local = uc // nu
            term_code = uc % nu
            doc_lens = np.bincount(local, minlength=n_rows)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids[did_local], type=pa.int64()),
                    pc.take(vocab, pa.array(term_code)),
                    pa.array(cnt.astype(np.int32), type=pa.int32()),
                    pa.array(doc_lens[did_local].astype(np.int32), type=pa.int32()),
                ],
                names=["doc_id", "term", "tf", "doc_len"],
            )

    return corpus_ids.select("doc_id", "content").mapInArrow(
        tok, schema=TOKENS_SCHEMA
    )


# ----------------------------------------------------------------- chunks --

def _pa_postings_schema():
    import pyarrow as pa
    return pa.schema([
        ("term", pa.string()),
        ("doc_lo", pa.int64()),
        ("doc_hi", pa.int64()),
        ("count", pa.int32()),
        ("sum_tf", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("max_impact", pa.float32()),
        ("tf_off", pa.int32()),
        ("dl_off", pa.int32()),
        ("blob", pa.binary()),
    ])


def _chunks_recordbatch(dictionary, codes, ids, tfs, dls, cst, cen,
                        k1, b, avgdl32):
    """Vectorized chunk emission from (term-code, doc)-sorted arrays and
    chunk boundaries [cst, cen): whole-batch impact computation, reduceat
    aggregates, ONE varbyte pass per stream, per-chunk byte slicing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from nextsearch_api_spark.functions.codec import varbyte_encode_all

    one = np.float32(1.0)
    tf32 = tfs.astype(np.float32)
    dl32 = dls.astype(np.float32)
    imp_all = (tf32 * (k1 + one)
               / (tf32 + k1 * (one - b + b * (dl32 / avgdl32)))).astype(np.float32)
    m = int(cen[-1])  # rows covered by chunks (any held-back tail excluded)
    gaps = np.empty(m, dtype=np.int64)
    gaps[1:] = ids[1:m] - ids[: m - 1]
    gaps[cst] = ids[cst]  # absolute doc_id at every chunk start
    gbytes, goffs = varbyte_encode_all(gaps)
    tbytes, toffs = varbyte_encode_all(tfs[:m])
    dbytes, doffs = varbyte_encode_all(dls[:m])

    sum_tf = np.add.reduceat(tfs[:m], cst)
    max_tf = np.maximum.reduceat(tfs[:m], cst)
    # min_dl: with max_tf it yields a sound per-chunk impact upper bound for
    # ANY (k1, b, avgdl) — the serving tier recomputes bounds at load, so
    # stats drift (incremental compaction changes avgdl) can never make the
    # stored build-time max_impact unsound
    min_dl = np.minimum.reduceat(dls[:m], cst)
    max_imp = np.maximum.reduceat(imp_all[:m], cst)

    blobs: list[bytes] = []
    tfo = np.empty(len(cst), dtype=np.int32)
    dlo = np.empty(len(cst), dtype=np.int32)
    for i in range(len(cst)):
        s, e = int(cst[i]), int(cen[i])
        g = gbytes[goffs[s]:goffs[e]].tobytes()
        t = tbytes[toffs[s]:toffs[e]].tobytes()
        d = dbytes[doffs[s]:doffs[e]].tobytes()
        blobs.append(g + t + d)
        tfo[i] = len(g)
        dlo[i] = len(g) + len(t)

    term_out = pc.take(dictionary, pa.array(codes[cst].astype(np.int32)))
    return pa.RecordBatch.from_arrays(
        [
            term_out,
            pa.array(ids[cst]),
            pa.array(ids[cen - 1]),
            pa.array((cen - cst).astype(np.int32)),
            pa.array(sum_tf.astype(np.int64)),
            pa.array(max_tf.astype(np.int32)),
            pa.array(min_dl.astype(np.int32)),
            pa.array(max_imp.astype(np.float32)),
            pa.array(tfo),
            pa.array(dlo),
            pa.array(blobs, type=pa.binary()),
        ],
        schema=_pa_postings_schema(),
    )


def write_postings_sorted(chunks: DataFrame, out_path: str,
                          partitions: int | None = None) -> None:
    """Write chunk rows range-partitioned + sorted by (term, doc_lo): tight
    per-row-group term min/max stats → query-term predicates prune to the
    few row groups actually holding the term."""
    spark = chunks.sparkSession
    P = partitions or min(
        64, max(8, int(spark.conf.get("spark.sql.shuffle.partitions")))
    )
    (chunks.repartitionByRange(P, "term", "doc_lo")
     .sortWithinPartitions("term", "doc_lo")
     .write.mode("overwrite").parquet(out_path))


def build_posting_chunks_segment(corpus_ids: DataFrame, avgdl: float,
                                 cfg: BuildConfig) -> DataFrame:
    """NO-SHUFFLE postings build (the default, Lucene-segment-style).

    Input: (doc_id, content[, seg]). Each partition is one *segment*: fused
    Arrow tokenize → in-partition lexsort by (term, doc_id) → chunk emission.
    Token rows are born and consumed inside the Python worker — they NEVER
    cross the JVM↔Python boundary and there is NO exchange: per-partition
    transfer is content in (~split bytes), chunk rows out (~compressed
    postings).

    Disjointness invariant: every emitted chunk's [doc_lo, doc_hi] range must
    be disjoint from every other chunk's of the same term, across ALL
    partitions (the query tiers' cursor model depends on it). ``seg`` — the
    id-assignment bucket, a contiguous disjoint doc-id range — enforces it:
    chunks additionally break on seg boundaries, so a chunk's range is always
    a sub-range of one seg. Without seg breaks the invariant silently relied
    on ids files being doc-range-disjoint, which the shuffle's hash placement
    of buckets into files does NOT guarantee (caught by an overlapping-chunk
    WAND failure when building over a lang-partitioned corpus). Callers
    without a seg column (single contiguous range per partition, e.g. after
    repartitionByRange(doc_id)) may omit it.

    Scale notes: chunks-per-term grows with partition count (like Lucene
    segments); hot terms are naturally split by doc range. For extreme
    partition counts, compact small chunks with a follow-up merge keyed by
    term (cheap: per-term metadata, not postings, drives the decision). The
    shuffle-based variant (build_posting_chunks) remains available as
    cfg.postings_mode='global'."""
    k1 = np.float32(cfg.bm25.k1)
    b = np.float32(cfg.bm25.b)
    avgdl32 = np.float32(avgdl)
    chunk_size = cfg.chunk_size

    def builder(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        from nextsearch_api_spark.functions.text import STOPWORDS
        sw = pa.array(list(STOPWORDS), type=pa.string())

        term_parts: list = []   # arrow string arrays (no python objects)
        ids_parts: list = []
        tf_parts: list = []
        dl_parts: list = []
        seg_parts: list = []

        for batch in batches:
            if batch.num_rows == 0:
                continue
            content = batch.column("content")
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            seg_ids = (
                batch.column("seg").to_numpy(zero_copy_only=False).astype(np.int64)
                if "seg" in batch.schema.names
                else np.zeros(batch.num_rows, dtype=np.int64)
            )
            toks = pc.split_pattern_regex(pc.utf8_lower(content), "[^a-z0-9]+")
            parent = pc.list_parent_indices(toks)
            flat = pc.list_flatten(toks)
            keep = pc.and_kleene(
                pc.greater_equal(pc.utf8_length(flat), 2),
                pc.invert(pc.is_in(flat, value_set=sw)),
            )
            flat = pc.filter(flat, keep)
            parent = pc.filter(parent, keep)
            if len(flat) == 0:
                continue
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            local = parent.to_numpy(zero_copy_only=False).astype(np.int64)
            nu = len(enc.dictionary)
            combo = local * nu + codes
            uc, cnt = np.unique(combo, return_counts=True)
            did_local = uc // nu
            tcode = (uc % nu).astype(np.int64)
            doc_lens = np.bincount(local, minlength=batch.num_rows)
            term_parts.append(pc.take(enc.dictionary, pa.array(tcode)))
            ids_parts.append(doc_ids[did_local])
            tf_parts.append(cnt.astype(np.int64))
            dl_parts.append(doc_lens[did_local].astype(np.int64))
            seg_parts.append(seg_ids[did_local])

        if not ids_parts:
            return
        import pyarrow as pa  # noqa: F811 (re-import for clarity)
        terms_all = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in term_parts]
        )
        enc_all = pc.dictionary_encode(terms_all)
        if isinstance(enc_all, pa.ChunkedArray):
            enc_all = enc_all.combine_chunks()
        codes = enc_all.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        segs = np.concatenate(seg_parts)
        order = np.lexsort((ids, codes))
        codes, ids, tfs, dls, segs = (
            codes[order], ids[order], tfs[order], dls[order], segs[order]
        )

        n = len(codes)
        # chunk runs break on term AND seg change: segs are disjoint
        # contiguous doc ranges, so along the (term, doc_id) sort each seg's
        # docs are consecutive and the break keeps every chunk inside one seg
        change = (codes[1:] != codes[:-1]) | (segs[1:] != segs[:-1])
        starts = np.nonzero(np.concatenate(([True], change)))[0]
        ends = np.concatenate((starts[1:], [n]))
        c_starts: list[int] = []
        c_ends: list[int] = []
        for s, e in zip(starts, ends):
            for pos in range(s, e, chunk_size):
                c_starts.append(pos)
                c_ends.append(min(pos + chunk_size, e))
        cst = np.array(c_starts, dtype=np.int64)
        cen = np.array(c_ends, dtype=np.int64)
        yield _chunks_recordbatch(enc_all.dictionary, codes, ids, tfs, dls,
                                  cst, cen, k1, b, avgdl32)

    cols = ["doc_id", "content"]
    if "seg" in [f.name for f in corpus_ids.schema.fields]:
        cols.append("seg")
    src = corpus_ids.select(*cols)
    if cfg.segment_partitions:
        # explicit segment sizing; range partitioning by doc_id keeps the
        # per-segment doc ranges disjoint (the correctness invariant)
        src = src.repartitionByRange(cfg.segment_partitions, "doc_id")
    return src.mapInArrow(builder, schema=POSTINGS_SCHEMA)


def build_posting_chunks(tokens: DataFrame, avgdl: float, cfg: BuildConfig,
                         partitions: int | None = None) -> DataFrame:
    """tokens (doc_id, term, tf, doc_len) → chunked, compressed posting rows.

    Skew handling: hash-partition by (term, doc_block) where doc_block =
    doc_id div cfg.doc_block — a DETERMINISTIC salt derived from doc ranges.
    A hot term's postings spread across as many partitions as it has doc
    blocks, while each (term, block)'s rows stay together and doc ranges of
    different blocks never overlap — so every partition emits independent,
    disjoint, doc-ordered chunks with memory bounded by chunk_size. Compared
    to repartitionByRange this removes the range partitioner's sampling scan
    (a full extra pass over the token stream) and makes the physical layout
    reproducible run-to-run."""
    spark = tokens.sparkSession
    P = partitions or cfg.postings_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    k1 = np.float32(cfg.bm25.k1)
    b = np.float32(cfg.bm25.b)
    avgdl32 = np.float32(avgdl)
    chunk_size = cfg.chunk_size

    def builder(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        """Arrow-native chunk builder. Term strings NEVER become Python
        objects: the term column rides through as an Arrow array (dictionary-
        encoded for group detection, pc.take for per-chunk output); numerics
        are zero-copy NumPy.

        Chunk runs break on (term, _blk) so chunks never span doc blocks —
        two blocks of one term may share a partition while a block between
        them lives elsewhere, and a spanning chunk would overlap its range."""
        import pyarrow as pa
        import pyarrow.compute as pc

        def emit(tbl: "pa.Table", complete_only: bool):
            terms = tbl.column("term").combine_chunks()
            blks = tbl.column("_blk").to_numpy(zero_copy_only=False)
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            tfs = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
            dls = tbl.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
            enc = pc.dictionary_encode(terms)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            n = len(codes)
            change = (codes[1:] != codes[:-1]) | (blks[1:] != blks[:-1])
            starts = np.nonzero(np.concatenate(([True], change)))[0]
            ends = np.concatenate((starts[1:], [n]))

            # chunk boundaries (group-aligned) + leftover tail hold-back
            leftover = None
            c_starts: list[int] = []
            c_ends: list[int] = []
            for s, e in zip(starts, ends):
                if complete_only and e == n and (e - s) % chunk_size != 0:
                    tail = e - ((e - s) % chunk_size)
                    leftover = tbl.slice(tail)
                    e = tail
                for pos in range(s, e, chunk_size):
                    c_starts.append(pos)
                    c_ends.append(min(pos + chunk_size, e))
            if not c_starts:
                return None, leftover
            cst = np.array(c_starts, dtype=np.int64)
            cen = np.array(c_ends, dtype=np.int64)
            rb = _chunks_recordbatch(enc.dictionary, codes, ids,
                                     tfs, dls, cst, cen,
                                     k1, b, avgdl32)
            return rb, leftover

        buf: "pa.Table | None" = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            if buf is not None:
                tbl = pa.concat_tables([buf, tbl]).combine_chunks()
                buf = None
            out_rb, buf = emit(tbl, complete_only=True)
            if out_rb is not None:
                yield out_rb
        if buf is not None and buf.num_rows:
            out_rb, _ = emit(buf, complete_only=False)
            if out_rb is not None:
                yield out_rb

    return (
        tokens.withColumn("_blk", F.floor(F.col("doc_id") / cfg.doc_block))
        .repartition(P, "term", "_blk")
        .sortWithinPartitions("term", "doc_id")
        .mapInArrow(builder, schema=POSTINGS_SCHEMA)
    )


# ------------------------------------------------------------------ build --

def build_index(spark: SparkSession, corpus: DataFrame, out_root: str,
                cfg: BuildConfig | None = None, resume: bool = True) -> dict:
    """Full resumable build. Returns the stage-metrics dict."""
    cfg = cfg or BuildConfig()
    paths = IndexPaths(out_root)
    os.makedirs(out_root, exist_ok=True)
    # A batch (re)build claims the base-name generation: drop any compaction
    # pointer and its generation dirs so every stage reads/writes one
    # consistent layout. (Streamed deltas are not part of the batch corpus —
    # rebuilding from the corpus supersedes them by definition; after a
    # generation flip the base dirs are gone anyway, so stages re-run.)
    from nextsearch_api_spark.config import CURRENT_POINTER
    cur_ptr = os.path.join(out_root, CURRENT_POINTER)
    if os.path.exists(cur_ptr):
        import shutil
        from nextsearch_api_spark.plans.generations import (
            DEFAULT_COMPONENTS, current_mapping,
        )
        mapping = current_mapping(out_root)
        os.remove(cur_ptr)
        stale_names = {
            mapping.get(comp, default)
            for comp, default in DEFAULT_COMPONENTS.items()
            if mapping.get(comp, default) != default
        } | set(mapping.get("gc_pending", []))  # deferred-GC leftovers too
        for phys in stale_names:
            if phys in DEFAULT_COMPONENTS.values():
                continue
            stale = os.path.join(out_root, phys)
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
            elif os.path.exists(stale):
                os.remove(stale)
    manifest = BuildManifest.load(paths.manifest) if resume else BuildManifest(
        paths.manifest, {"stages": {}, "created_at": time.time()}
    )
    base_fp = {
        "format": FORMAT_VERSION,
        "chunk_size": cfg.chunk_size,
        "doc_block": cfg.doc_block, "postings_mode": cfg.postings_mode,
        "segment_partitions": cfg.segment_partitions,
        "serving_layout": cfg.serving_layout,
        "k1": cfg.bm25.k1, "b": cfg.bm25.b, "tokenizer": cfg.tokenizer,
        "corpus": _corpus_fingerprint(corpus),
    }
    runner = StageRunner(manifest, base_fp)

    ids_path = os.path.join(out_root, "ids")
    forward_path = os.path.join(out_root, "forward")

    def stage_ids() -> dict:
        # One corpus pass: deterministic ids + content hashes + doc_len (the
        # Arrow tokenize subset, fused after the id exchange), materialized
        # so later stages column-prune what they need (content is only read
        # again by the postings tokenizer) and resume never re-runs the
        # assignment. N/total_len are observed DURING this write (metric
        # accumulators over the same pass), so the stats stage needs no job
        # at all and — crucially — no longer waits on the docs rewrite:
        # stats depends only on ids, which lets the docs stage run
        # CONCURRENTLY with the postings build (r5, VERDICT r4 next #8 —
        # the docs rewrite was ~1 s of pure serial critical path at 16
        # cores, and its tasks now pack into the postings stage's straggler
        # tail).
        from pyspark.sql import Observation
        obs = Observation("ids_stats")
        ids = assign_doc_ids(corpus, cfg.id_partitions).select(
            "doc_id",
            F.substring(
                F.sha2(F.concat_ws("", "repo", "path", "commit"), 256), 1, 16
            ).alias("uid"),
            "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256).alias("content_sha256"),
            "content", "seg",
        )
        with_len = append_doc_len(ids).observe(
            obs,
            F.sum((F.col("doc_len") > 0).cast("long")).alias("N"),
            F.sum("doc_len").alias("total_len"),
        )
        with_len.write.mode("overwrite").parquet(ids_path)
        got = obs.get
        return {"rows": _parquet_rows(ids_path),
                "N": int(got["N"] or 0), "total_len": int(got["total_len"] or 0)}

    runner.run("ids", stage_ids, output=ids_path)

    if cfg.materialize_forward:
        def stage_forward() -> dict:
            ids = spark.read.parquet(ids_path)
            tokens = tokenize_tf(ids, cfg.tokenizer)
            tokens.write.mode("overwrite").parquet(forward_path)
            return {"rows": _parquet_rows(forward_path)}

        runner.run("forward", stage_forward, output=forward_path)

    def stage_docs() -> dict:
        # content-pruned scan of ids; doc_len > 0 drops zero-token docs,
        # mirroring the reference (src/ForwardIndex.cpp:152). Runs in a
        # SIDE THREAD concurrently with the postings build (see below) —
        # stats no longer depends on it (observed during the ids write).
        docs = (
            spark.read.parquet(ids_path)
            .where(F.col("doc_len") > 0)
            .select("doc_id", "uid", "repo", "path", "commit", "lang",
                    "doc_len", "content_sha256")
        )
        docs.write.mode("overwrite").parquet(paths.docs)
        return {"rows": _parquet_rows(paths.docs)}

    def stage_stats() -> dict:
        im = runner.metrics.get("ids", {})
        if "N" in im and "total_len" in im:  # observed during the ids write
            N, total_len = int(im["N"]), int(im["total_len"])
        else:  # ids stage skipped from a pre-observation manifest
            row = (
                spark.read.parquet(ids_path)
                .where(F.col("doc_len") > 0)
                .agg(F.count("*").alias("N"),
                     F.sum("doc_len").alias("total_len"))
                .collect()[0]
            )
            N, total_len = int(row["N"]), int(row["total_len"] or 0)
        avgdl = float(total_len) / N if N else 0.0
        # impact_avgdl: the avgdl every chunk's stored f32 impacts (max_impact)
        # were computed with. While it equals the serving avgdl, stored chunk
        # maxes are ATTAINED query-time impacts — the batch tier's chunk
        # prefilter (operators/query.py) relies on that; incremental ingest
        # drops the marker when generations mix avgdls.
        stats = {"N": N, "avgdl": avgdl, "total_len": total_len,
                 "impact_avgdl": avgdl,
                 "k1": cfg.bm25.k1, "b": cfg.bm25.b,
                 "format": FORMAT_VERSION, "built_at": time.time()}
        with open(paths.stats, "w") as f:
            json.dump(stats, f, indent=2)
        return {"rows": N}

    runner.run("stats", stage_stats, output=paths.stats)

    with open(paths.stats) as f:
        stats = json.load(f)

    # docs rewrite ∥ postings build: independent stages (docs = column-pruned
    # ids scan; postings reads ids separately), same SparkSession, separate
    # thread — the docs tasks fill the postings stage's scheduling gaps and
    # straggler tails instead of occupying the serial critical path.
    import threading
    _docs_err: list[BaseException] = []

    def _docs_job() -> None:
        try:
            runner.run("docs", stage_docs, output=paths.docs)
        except BaseException as e:  # propagate into the build thread
            _docs_err.append(e)

    docs_thread = threading.Thread(target=_docs_job, name="docs-stage")
    docs_thread.start()

    def stage_postings() -> dict:
        if cfg.postings_mode == "segment":
            ids = spark.read.parquet(ids_path).select("doc_id", "content", "seg")
            chunks = build_posting_chunks_segment(ids, stats["avgdl"], cfg)
        else:
            tokens = (
                spark.read.parquet(forward_path)
                if cfg.materialize_forward
                else tokenize_tf(spark.read.parquet(ids_path), cfg.tokenizer)
            )
            chunks = build_posting_chunks(tokens, stats["avgdl"], cfg)
        if cfg.serving_layout == "term":
            # Term-locality rewrite for the serving tier: segment-mode output
            # files each span ~the whole vocab, so a query-term predicate
            # prunes nothing and every file is scanned per query (measured:
            # ~85% of WAND latency was this read). Materialize the raw
            # chunks, then range-partition + sort by (term, doc_lo) so
            # Parquet footer min/max confine each term to 1-2 row groups —
            # the on-disk analog of the reference's contiguous per-term
            # posting regions (lexicon offset + seek). Chunk ROWS are
            # shuffled here (compressed postings, a fraction of corpus
            # bytes), never token rows — the build itself stays no-shuffle.
            # One materialization, not two: repartitionByRange executes its
            # input an extra time to sample range bounds, so the raw chunks
            # must be reusable — r2 wrote them to a _raw parquet dir and
            # re-read it (a full extra write+read of the postings, VERDICT
            # r2). persist() keeps the builder's output in executor
            # memory/disk instead: the sampling pass populates the cache and
            # the shuffle reads it back, with no parquet encode/decode.
            from pyspark import StorageLevel
            chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
            ok = False
            try:
                write_postings_sorted(chunks, paths.postings)
                ok = True
            finally:
                if not ok:
                    chunks.unpersist()
            # hand the still-persisted chunk rows to the lexicon stage: its
            # aggregation reads the cache instead of re-reading the postings
            # parquet (write_postings_sorted only repartitions + sorts, so
            # the rows are identical). Unpersisted after the lexicon runs.
            _chunks_handoff["df"] = chunks
        else:
            chunks.write.mode("overwrite").parquet(paths.postings)
        return {"rows": _parquet_rows(paths.postings)}

    _chunks_handoff: dict = {}
    try:
        runner.run("postings", stage_postings, output=paths.postings)
    finally:
        docs_thread.join()
    if _docs_err:
        raise _docs_err[0]

    def stage_lexicon() -> dict:
        cached = _chunks_handoff.get("df")
        postings = cached if cached is not None \
            else spark.read.parquet(paths.postings)
        lex = (
            postings.groupBy("term").agg(
                F.sum("count").cast("long").alias("df"),
                F.sum("sum_tf").cast("long").alias("cf"),
                F.count("*").cast("int").alias("n_chunks"),
                F.max("max_impact").alias("max_impact"),
            )
        )
        # range-partition + sort by term → parquet min/max footer stats give
        # term-lookup pruning (the reference's barrel/offset seek analog).
        # persist: repartitionByRange double-executes its input for range
        # sampling, and the input here is the whole postings aggregation
        lex = lex.persist()
        try:
            lp = 64
            (lex.repartitionByRange(lp, "term").sortWithinPartitions("term")
                .write.mode("overwrite").parquet(paths.lexicon))
        finally:
            lex.unpersist()
        return {"rows": _parquet_rows(paths.lexicon)}

    try:
        runner.run("lexicon", stage_lexicon, output=paths.lexicon)
    finally:
        if "df" in _chunks_handoff:
            _chunks_handoff["df"].unpersist()

    if cfg.build_suggest:
        def stage_suggest() -> dict:
            from nextsearch_api_spark.operators.autocomplete import build_suggest
            lex = spark.read.parquet(paths.lexicon)
            # Serving layout for LazySuggester: prefix-RANGE partitioning
            # (a prefix's ≤10 rows land in exactly one file, file ranges
            # near-disjoint) + sort within partitions + ~1 MiB row groups →
            # every footer row-group stat is a tight [lo, hi] prefix range,
            # so one lookup prunes to ~1 row group instead of collecting the
            # whole table (VERDICT r5 next #1). persist(): repartitionByRange
            # range-samples its input, which would otherwise re-run the
            # explode+window twice.
            sug = build_suggest(lex).persist()
            try:
                n = sug.count()
                parts = max(1, n // 2_000_000 + (1 if n % 2_000_000 else 0))
                (sug.repartitionByRange(parts, "prefix")
                    .sortWithinPartitions("prefix", "rnk")
                    .write.mode("overwrite")
                    .option("parquet.block.size", 1 << 20)
                    .parquet(paths.suggest))
            finally:
                sug.unpersist()
            return {"rows": _parquet_rows(paths.suggest)}

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
