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

# deferred-impact build output (segment mode, avgdl unknown at tokenize
# time): POSTINGS_SCHEMA + per-chunk (tf, dl) Pareto frontier; the frontier
# columns are consumed by finalize_max_impact and never reach disk
POSTINGS_BUILD_SCHEMA = StructType(
    POSTINGS_SCHEMA.fields + [
        StructField("fr_tf", ArrayType(IntegerType(), False), False),
        StructField("fr_dl", ArrayType(IntegerType(), False), False),
    ]
)

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

def _pa_postings_schema(frontier: bool = False):
    import pyarrow as pa
    fields = [
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
    ]
    if frontier:
        fields += [("fr_tf", pa.list_(pa.int32())),
                   ("fr_dl", pa.list_(pa.int32()))]
    return pa.schema(fields)


def _chunks_recordbatch(dictionary, codes, ids, tfs, dls, cst, cen,
                        k1, b, avgdl32):
    """Vectorized chunk emission from (term-code, doc)-sorted arrays and
    chunk boundaries [cst, cen): whole-batch impact computation, reduceat
    aggregates, ONE varbyte pass per stream, per-chunk byte slicing.

    ``avgdl32=None`` = deferred-impact mode (the segment build path, r6):
    avgdl is not known yet — the corpus is tokenized exactly ONCE, in this
    pass, and avgdl is derived from it afterwards. Instead of max_impact the
    batch carries each chunk's Pareto frontier of (tf, dl) pairs (points not
    dominated by another point with tf' ≥ tf and dl' ≤ dl). BM25 impact is
    increasing in tf and decreasing in dl, so for ANY avgdl the attained
    chunk max lies on the frontier; ``finalize_max_impact`` evaluates it
    with the same float32 arithmetic once avgdl exists. (Stepwise f32
    rounding is monotone in dl and can invert the tf direction by ~1 ulp,
    i.e. the finalized value may understate the true f32 max by ~1e-7
    relative — two orders of magnitude inside the 1e-5 slack the chunk
    prefilter already applies, operators/query.py _CHUNK_PRUNE_SLACK.)"""
    import pyarrow as pa
    import pyarrow.compute as pc

    from nextsearch_api_spark.functions.codec import varbyte_encode_all

    one = np.float32(1.0)
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

    fr_off = fr_tf_vals = fr_dl_vals = None
    if avgdl32 is not None:
        tf32 = tfs[:m].astype(np.float32)
        dl32 = dls[:m].astype(np.float32)
        imp_all = (tf32 * (k1 + one)
                   / (tf32 + k1 * (one - b + b * (dl32 / avgdl32))))
        max_imp = np.maximum.reduceat(imp_all, cst)
    else:
        # per-chunk Pareto frontier, one vectorized pass: sort rows by
        # (chunk, tf desc, dl asc); a row is on the frontier iff its dl is
        # strictly below the running per-chunk min (rows before it have
        # ≥ tf). Equal (tf, dl) duplicates collapse to one point.
        cid = np.searchsorted(cen, np.arange(m), side="right")
        order = np.lexsort((dls[:m], -tfs[:m], cid))
        cs = cid[order]
        ds = dls[:m][order]
        gmin = pd.Series(ds).groupby(cs).cummin().to_numpy()
        first = np.empty(m, dtype=bool)
        first[0] = True
        first[1:] = cs[1:] != cs[:-1]
        prev = np.empty(m, dtype=ds.dtype)
        prev[0] = 0
        prev[1:] = gmin[:-1]
        keep = first | (ds < prev)
        counts = np.bincount(cs[keep], minlength=len(cst))
        fr_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        kept = order[keep]
        fr_tf_vals = tfs[:m][kept].astype(np.int32)
        fr_dl_vals = dls[:m][kept].astype(np.int32)
        max_imp = np.zeros(len(cst), dtype=np.float32)  # finalized later

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
    arrays = [
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
    ]
    if avgdl32 is None:
        arrays += [
            pa.ListArray.from_arrays(pa.array(fr_off),
                                     pa.array(fr_tf_vals, type=pa.int32())),
            pa.ListArray.from_arrays(pa.array(fr_off),
                                     pa.array(fr_dl_vals, type=pa.int32())),
        ]
    return pa.RecordBatch.from_arrays(
        arrays, schema=_pa_postings_schema(frontier=avgdl32 is None),
    )


def write_postings_sorted(chunks: DataFrame, out_path: str,
                          partitions: int | None = None,
                          post_sort=None) -> None:
    """Write chunk rows range-partitioned + sorted by (term, doc_lo): tight
    per-row-group term min/max stats → query-term predicates prune to the
    few row groups actually holding the term.

    ``post_sort``: optional order-preserving DataFrame transform applied
    AFTER the sort, before the write (the deferred-impact finalize) — placed
    here so the range-sampling pass and the shuffle both read the cheap
    cached input and the transform runs exactly once, on the sorted
    stream."""
    spark = chunks.sparkSession
    P = partitions or min(
        64, max(8, int(spark.conf.get("spark.sql.shuffle.partitions")))
    )
    out = (chunks.repartitionByRange(P, "term", "doc_lo")
           .sortWithinPartitions("term", "doc_lo"))
    if post_sort is not None:
        out = post_sort(out)
    out.write.mode("overwrite").parquet(out_path)


# Doc-stat carrier rows (segment build, deferred-impact mode): the fused
# tokenize pass is the ONLY place doc_len exists, so each task packs its
# (doc_id, doc_len) pairs — zero-token docs excluded — into chunk-schema rows
# with term '' (real terms are ≥ 2 chars, so '' can never collide). Packing
# ~64k docs per row keeps the stat rows a vanishing fraction of the chunk
# table (one row per ~64k docs vs one chunk row per ≤ chunk_size postings);
# one row per doc would INVERT that ratio at 10^12 docs. blob layout: int64
# doc_ids ++ int32 doc_lens, split point in tf_off.
_DOCSTAT_PACK = 65536

DOCLEN_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("doc_len", IntegerType(), False),
])


def _docstat_recordbatch(stat_ids: list, stat_dls: list):
    import pyarrow as pa
    sids = np.concatenate(stat_ids)
    sdls = np.concatenate(stat_dls).astype(np.int32)
    o = np.argsort(sids, kind="stable")  # file order is already ~sorted
    sids, sdls = sids[o], sdls[o]
    cols: dict[str, list] = {k: [] for k in
                             ("lo", "hi", "n", "tot", "off", "blob")}
    for s in range(0, len(sids), _DOCSTAT_PACK):
        e = min(s + _DOCSTAT_PACK, len(sids))
        cols["lo"].append(int(sids[s]))
        cols["hi"].append(int(sids[e - 1]))
        cols["n"].append(e - s)
        cols["tot"].append(int(sdls[s:e].sum()))
        cols["off"].append(8 * (e - s))
        cols["blob"].append(sids[s:e].tobytes() + sdls[s:e].tobytes())
    k = len(cols["lo"])
    empty_list = pa.ListArray.from_arrays(
        pa.array(np.zeros(k + 1, dtype=np.int32)),
        pa.array([], type=pa.int32()))
    return pa.RecordBatch.from_arrays(
        [
            pa.array([""] * k, type=pa.string()),
            pa.array(cols["lo"], type=pa.int64()),
            pa.array(cols["hi"], type=pa.int64()),
            pa.array(cols["n"], type=pa.int32()),
            pa.array(cols["tot"], type=pa.int64()),
            pa.array([0] * k, type=pa.int32()),
            pa.array([0] * k, type=pa.int32()),
            pa.array([0.0] * k, type=pa.float32()),
            pa.array(cols["off"], type=pa.int32()),
            pa.array([0] * k, type=pa.int32()),
            pa.array(cols["blob"], type=pa.binary()),
            empty_list,
            empty_list,
        ],
        schema=_pa_postings_schema(frontier=True),
    )


def decode_doclen_rows(stat_rows: DataFrame) -> DataFrame:
    """Doc-stat carrier rows → (doc_id, doc_len) DataFrame (one row per doc
    with ≥ 1 kept token — exactly the reference's N population,
    src/ForwardIndex.cpp:152)."""
    def go(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            blobs = batch.column("blob").to_pylist()
            offs = batch.column("tf_off").to_pylist()
            ids = np.concatenate([np.frombuffer(bb[:o], dtype=np.int64)
                                  for bb, o in zip(blobs, offs)])
            dls = np.concatenate([np.frombuffer(bb[o:], dtype=np.int32)
                                  for bb, o in zip(blobs, offs)])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(dls)],
                schema=pa.schema([("doc_id", pa.int64()),
                                  ("doc_len", pa.int32())]),
            )

    return stat_rows.select("blob", "tf_off").mapInArrow(go, DOCLEN_SCHEMA)


def finalize_max_impact(chunks: DataFrame, avgdl: float,
                        cfg: BuildConfig) -> DataFrame:
    """Deferred-impact chunks → final POSTINGS_SCHEMA: per-chunk max_impact
    evaluated over the stored (tf, dl) Pareto frontier with the now-known
    avgdl, frontier columns dropped. Same float32 arithmetic as the eager
    path (and as query-time decode), so the stored value remains an ATTAINED
    query-time impact — the exactness precondition of the batch tier's chunk
    prefilter (operators/query.py:_plan_chunk_prune); verified bit-identical
    to the eager path's output on a 2k-doc corpus. A vectorized pandas_udf
    over ONLY the two frontier columns — the blob bytes (the bulk of every
    chunk row) never cross the JVM↔Python boundary."""
    from pyspark.sql.functions import pandas_udf

    k1 = np.float32(cfg.bm25.k1)
    b = np.float32(cfg.bm25.b)
    # avgdl == 0 ⇔ no doc has tokens ⇔ no real chunks exist; the guard only
    # keeps the f32 math finite on that empty plan
    avgdl32 = np.float32(avgdl if avgdl > 0 else 1.0)

    @pandas_udf("float")
    def _frontier_max(fr_tf: pd.Series, fr_dl: pd.Series) -> pd.Series:
        one = np.float32(1.0)
        lens = fr_tf.str.len().to_numpy(dtype=np.int64)
        if len(lens) == 0:
            return pd.Series(np.empty(0, dtype=np.float32))
        if not (lens > 0).all():  # every chunk has ≥ 1 posting
            raise ValueError("chunk row with empty impact frontier")
        ftf = np.concatenate(fr_tf.to_numpy()).astype(np.float32)
        fdl = np.concatenate(fr_dl.to_numpy()).astype(np.float32)
        imp = ftf * (k1 + one) / (ftf + k1 * (one - b + b * (fdl / avgdl32)))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        return pd.Series(np.maximum.reduceat(imp, starts).astype(np.float32))

    out_cols = [f.name for f in POSTINGS_SCHEMA.fields]
    return (chunks.withColumn("max_impact",
                              _frontier_max("fr_tf", "fr_dl"))
            .select(*out_cols))


def build_posting_chunks_segment(corpus_ids: DataFrame, avgdl: float | None,
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
    cfg.postings_mode='global'.

    ``avgdl=None`` (the build_index default since r6): deferred-impact mode.
    This pass is the corpus's ONLY tokenize — doc_len/avgdl no longer come
    from a second tokenize in the ids stage (measured: that pass was 11 s of
    the 17 s 8-core ids stage at 400k docs, pure duplicate work). Chunks
    carry a (tf, dl) Pareto frontier instead of max_impact (see
    _chunks_recordbatch) and each task additionally emits doc-stat carrier
    rows (term '', see _docstat_recordbatch) from which build_index derives
    the doclen table, N, total_len and avgdl before finalize_max_impact
    evaluates the stored frontiers."""
    k1 = np.float32(cfg.bm25.k1)
    b = np.float32(cfg.bm25.b)
    avgdl32 = np.float32(avgdl) if avgdl is not None else None
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
        stat_ids: list = []     # deferred-impact mode: per-doc (id, len)
        stat_dls: list = []

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
            if avgdl32 is None:
                mask = doc_lens > 0  # zero-token docs are outside N
                stat_ids.append(doc_ids[mask].astype(np.int64))
                stat_dls.append(doc_lens[mask])

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
        if avgdl32 is None and stat_ids:
            yield _docstat_recordbatch(stat_ids, stat_dls)

    cols = ["doc_id", "content"]
    if "seg" in [f.name for f in corpus_ids.schema.fields]:
        cols.append("seg")
    src = corpus_ids.select(*cols)
    if cfg.segment_partitions:
        # explicit segment sizing; range partitioning by doc_id keeps the
        # per-segment doc ranges disjoint (the correctness invariant)
        src = src.repartitionByRange(cfg.segment_partitions, "doc_id")
    out_schema = POSTINGS_BUILD_SCHEMA if avgdl is None else POSTINGS_SCHEMA
    return src.mapInArrow(builder, schema=out_schema)


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
        # build-intermediate layout (ids schema / stats source), independent
        # of the serving format: bumping invalidates old manifests without
        # making old INDEXES unreadable. 2 = r6 single-tokenize flow (no
        # doc_len in ids; doclen table + stats derived from the postings
        # pass; deferred max_impact finalize).
        "build_layout": 2,
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
    doclen_path = os.path.join(out_root, "doclen")
    segment_mode = cfg.postings_mode == "segment"

    def stage_ids() -> dict:
        # One corpus pass: deterministic ids + content hashes, materialized
        # so later stages column-prune what they need (content is only read
        # again by the postings tokenizer) and resume never re-runs the
        # assignment. Segment mode (default) stores NO doc_len here: the
        # fused postings tokenize is the build's ONLY tokenize and derives
        # doc_len/avgdl itself (r6 — the append_doc_len pass existed solely
        # to learn avgdl before the postings stage and duplicated its
        # tokenize wholesale: measured 11 s of the 17 s 8-core ids stage at
        # 400k docs, ~30 s of 45 s at 2 cores — both DRAM-bandwidth-bound,
        # the worst-scaling work in the whole build).
        ids = assign_doc_ids(corpus, cfg.id_partitions).select(
            "doc_id",
            F.substring(
                F.sha2(F.concat_ws("", "repo", "path", "commit"), 256), 1, 16
            ).alias("uid"),
            "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256).alias("content_sha256"),
            "content", "seg",
        )
        if segment_mode:
            ids.write.mode("overwrite").parquet(ids_path)
            return {"rows": _parquet_rows(ids_path)}
        # global mode chunks pre-tokenized token rows and needs avgdl BEFORE
        # its postings stage: keep the fused doc_len + observed stats here
        from pyspark.sql import Observation
        obs = Observation("ids_stats")
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
        # reference parity: docs = rows with ≥ 1 kept token
        # (src/ForwardIndex.cpp:152). Segment mode joins the content-pruned
        # ids scan with the doclen table the postings tokenize emitted —
        # metadata-only rows on both sides, no content bytes move, and the
        # zero-token filter IS the inner join (such docs have no doclen
        # row). Runs in a SIDE THREAD overlapped with lexicon+suggest.
        if segment_mode:
            docs = (
                spark.read.parquet(ids_path)
                .select("doc_id", "uid", "repo", "path", "commit", "lang",
                        "content_sha256")
                .join(spark.read.parquet(doclen_path), "doc_id")
                .select("doc_id", "uid", "repo", "path", "commit", "lang",
                        "doc_len", "content_sha256")
            )
        else:
            docs = (
                spark.read.parquet(ids_path)
                .where(F.col("doc_len") > 0)
                .select("doc_id", "uid", "repo", "path", "commit", "lang",
                        "doc_len", "content_sha256")
            )
        docs.write.mode("overwrite").parquet(paths.docs)
        return {"rows": _parquet_rows(paths.docs)}

    def stage_stats() -> dict:
        # N/total_len were observed during the stage that tokenized the
        # corpus (postings in segment mode, ids in global mode); metrics
        # persist in the manifest so resume keeps them across processes.
        src_stage = "postings" if segment_mode else "ids"
        im = runner.metrics.get(src_stage, {})
        if "N" in im and "total_len" in im:
            N, total_len = int(im["N"]), int(im["total_len"])
        elif segment_mode:  # skipped stage recorded by a pre-metrics build
            row = (
                spark.read.parquet(doclen_path)
                .agg(F.count("*").alias("N"),
                     F.sum("doc_len").alias("total_len"))
                .collect()[0]
            )
            N, total_len = int(row["N"]), int(row["total_len"] or 0)
        else:
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

    from pyspark import StorageLevel
    _chunks_handoff: dict = {}

    def stage_postings_segment() -> dict:
        # THE corpus tokenize (the only one in the build, r6): the fused
        # builder runs in deferred-impact mode — chunks carry (tf, dl)
        # Pareto frontiers plus doc-stat carrier rows. The doclen write is
        # the first action (populating the persist); N/total_len/avgdl come
        # from a footer-cheap aggregate over it; finalize_max_impact then
        # turns frontiers into attained per-chunk maxes with that avgdl.
        ids = spark.read.parquet(ids_path).select("doc_id", "content", "seg")
        raw = build_posting_chunks_segment(ids, None, cfg).persist(
            StorageLevel.MEMORY_AND_DISK)
        try:
            decode_doclen_rows(raw.where(F.col("term") == "")) \
                .write.mode("overwrite").parquet(doclen_path)
            row = (
                spark.read.parquet(doclen_path)
                .agg(F.count("*").alias("N"),
                     F.sum("doc_len").alias("total_len"))
                .collect()[0]
            )
            N, total_len = int(row["N"]), int(row["total_len"] or 0)
            avgdl = float(total_len) / N if N else 0.0
            real = raw.where(F.col("term") != "")
            if cfg.serving_layout == "term":
                # Term-locality rewrite for the serving tier: segment-mode
                # output files each span ~the whole vocab, so a query-term
                # predicate prunes nothing and every file is scanned per
                # query (measured: ~85% of WAND latency was this read).
                # Range-partition + sort by (term, doc_lo) so Parquet footer
                # min/max confine each term to 1-2 row groups — the on-disk
                # analog of the reference's contiguous per-term posting
                # regions (lexicon offset + seek). Chunk ROWS are shuffled
                # here (compressed postings, a fraction of corpus bytes),
                # never token rows — the build itself stays no-shuffle.
                # The raw cache (populated by the doclen write) feeds the
                # range-sampling pass, the shuffle, and the lexicon below;
                # finalize runs post-sort so blobs stay cached exactly once
                # (a second finalized-side persist measured +30 s at 2
                # cores — one full extra serialize of the blob bytes).
                write_postings_sorted(
                    real, paths.postings,
                    post_sort=lambda df: finalize_max_impact(df, avgdl, cfg))
                # NO lexicon handoff here (unlike global mode): the lexicon
                # aggregate needs 4 small columns and the written postings
                # parquet serves them column-pruned — blobs never read —
                # which measured cheaper at 2 cores than re-running the
                # finalize udf over the cache, and lets the cache free now.
            else:
                finalize_max_impact(real, avgdl, cfg) \
                    .write.mode("overwrite").parquet(paths.postings)
        finally:
            # doclen + postings are on disk: the cache is fully consumed
            raw.unpersist(blocking=False)
        return {"rows": _parquet_rows(paths.postings),
                "N": N, "total_len": total_len}

    def stage_postings_global() -> dict:
        with open(paths.stats) as f:
            stats = json.load(f)
        tokens = (
            spark.read.parquet(forward_path)
            if cfg.materialize_forward
            else tokenize_tf(spark.read.parquet(ids_path), cfg.tokenizer)
        )
        chunks = build_posting_chunks(tokens, stats["avgdl"], cfg)
        if cfg.serving_layout == "term":
            # see stage_postings_segment for the rationale
            chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
            ok = False
            try:
                write_postings_sorted(chunks, paths.postings)
                ok = True
            finally:
                if not ok:
                    chunks.unpersist()
            _chunks_handoff["df"] = chunks
        else:
            chunks.write.mode("overwrite").parquet(paths.postings)
        return {"rows": _parquet_rows(paths.postings)}

    if segment_mode:
        # r6 stage order: postings runs FIRST (it owns the tokenize) and
        # derives doclen/N/total_len; stats persists them from the metrics.
        runner.run("postings", stage_postings_segment, output=paths.postings)
        runner.run("stats", stage_stats, output=paths.stats)
    else:
        runner.run("stats", stage_stats, output=paths.stats)
        runner.run("postings", stage_postings_global, output=paths.postings)

    # docs rewrite ∥ lexicon+suggest: docs depends only on ids (+doclen in
    # segment mode), so its tasks fill the lexicon/suggest stages'
    # scheduling gaps instead of occupying the serial critical path.
    import threading
    _docs_err: list[BaseException] = []

    def _docs_job() -> None:
        try:
            runner.run("docs", stage_docs, output=paths.docs)
        except BaseException as e:  # propagate into the build thread
            _docs_err.append(e)

    docs_thread = threading.Thread(target=_docs_job, name="docs-stage")
    docs_thread.start()

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
        try:
            runner.run("lexicon", stage_lexicon, output=paths.lexicon)
        finally:
            # segment mode hands off a view over the cached raw chunks;
            # global mode hands off the cached chunks themselves
            cached = _chunks_handoff.get("cache", _chunks_handoff.get("df"))
            if cached is not None:
                cached.unpersist()
    finally:
        docs_thread.join()
    if _docs_err:
        raise _docs_err[0]

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
