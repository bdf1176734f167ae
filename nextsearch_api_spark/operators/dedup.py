"""Deduplication operators for large-scale training-data pipelines.

All operators are declarative DataFrame pipelines over a corpus
``(doc_col: string id?, text_col: string)`` — no per-row Python; hashes are
md5-derived 60-bit ints (deterministic, SQL-oracle-reproducible), shingling
and banding are JVM expressions.

Scale notes (100 TB discipline):
  * exact_dedup — one hash-groupBy; map-side partial agg collapses dup keys
    before the shuffle.
  * minhash_signatures — explode(shingles) is the big intermediate; the
    groupBy(doc, seed).min is a partial-agg-friendly shuffle keyed by doc
    (never by shingle), so shingle skew is irrelevant.
  * lsh_candidate_pairs — self-join keyed by (band, band_signature); bucket
    sizes are bounded by near-duplicate cluster sizes, not corpus size. A
    ``max_bucket`` guard drops degenerate buckets (e.g. empty-text docs)
    that would otherwise produce quadratic pairs.
  * simhash — bit fan-out is a constant (×bits) on the (doc,term,tf) stream;
    the doc-keyed aggregation is partial-agg friendly.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# guards the persistent-RDD-id diff inside connected_components' checkpoint
# bookkeeping against concurrent persists from other driver threads
_CHECKPOINT_DIFF_LOCK = threading.Lock()


def md5_long(col) -> "F.Column":
    """60-bit deterministic hash (md5-hex prefix) — matches DuckDB's
    cast(('0x'||substr(md5(x),1,15)) as bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup → (content_md5, n_docs, keeper_doc_id)."""
    return (
        df.groupBy(F.md5(text_col).alias("content_md5"))
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.min(id_col).alias("keeper_doc_id"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc (lowercase [a-z0-9]+ tokens).

    Distinctness is per (doc, shingle), so it is computed with
    ``array_distinct`` BEFORE the explode — a per-doc JVM kernel — instead
    of a corpus-wide ``.distinct()``, which shuffled the entire shingle
    stream just to collapse within-doc repeats (r7; same result set, one
    exchange fewer)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')")
        .alias("toks"),
    )
    joins = ", ' ', ".join(f"element_at(toks, i + {j})" for j in range(n))
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN "
                f"array_distinct(transform(sequence(1, size(toks) - {n - 1}), "
                f"i -> concat({joins}))) ELSE array() END"
            )
        ).alias("shingle"),
    )


# bound on the per-worker shingle→hashes memo (entries are ~150 B each →
# ~600 MB at the cap); cleared wholesale when full — adversarially diverse
# corpora degrade to hashing per occurrence, never to unbounded memory
_SHINGLE_CACHE_MAX = 4_000_000


def _minhash_wide(df: DataFrame, text_col: str, id_col: str,
                  num_hashes: int, shingle_n: int) -> DataFrame:
    """(doc_id, _m0.._m{H-1}) — all ``num_hashes`` min-hashes in ONE
    zero-shuffle corpus pass.

    Tokens come from the SAME JVM expression ``shingles()`` uses (lower +
    [^a-z0-9]+ split + drop-empty — byte-identical token boundaries), and a
    mapInArrow kernel per partition builds each doc's shingle stream
    and folds per-seed minima of the md5-derived 60-bit hashes
    (int(md5(seed ':' shingle)[:15], 16) — exactly ``md5_long``'s
    conv(substr(md5(..),1,15),16,10), so values are identical to the SQL
    oracle).

    Why this shape (r7, guide §2.4/§4.2): the prior formulation computed the
    md5s once per globally-DISTINCT shingle and joined them back onto the
    exploded occurrence stream — but that plans the tokenize+explode subtree
    TWICE (distinct branch + join probe side, ~2.5 s each at sf1.0), shuffles
    the 2.6M-row occurrence stream for the sort-merge attach, and shuffles
    again for the doc-keyed min-agg: measured 4.7-6 s warm at sf1.0. Here the
    corpus is tokenized ONCE, nothing is exploded or shuffled (a doc's
    minhash is row-local), and cross-doc shingle redundancy — the very thing
    MinHash exists to find — is captured by a per-worker hash memo instead of
    a global distinct: repeated shingles cost a dict hit, the md5s are
    computed once per distinct shingle per worker (~30k × H at sf1.0).
    Measured 4.7 s → 0.6 s warm at sf1.0 (50k docs); linear in corpus bytes
    at 100 TB with per-task memory bounded by _SHINGLE_CACHE_MAX."""
    import numpy as np

    toks_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')")
        .alias("toks"),
    )
    # scale-adaptive parallelism (guide §2): the zero-shuffle pass inherits
    # the scan's partitioning, and a small corpus often arrives as 1-2
    # parquet splits — serializing the Python kernel. Repartition ONLY when
    # the input has fewer splits than cores (one cheap exchange of the raw
    # rows); a real 100 TB scan already has thousands of splits and skips
    # this. Row-to-partition placement cannot affect results (the kernel is
    # row-local and the final agg is doc-keyed).
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    try:
        nparts = toks_df.rdd.getNumPartitions()
    except Exception:
        nparts = None
    if nparts is not None and nparts < want:
        toks_df = toks_df.repartition(want)
    n = shingle_n
    nh = num_hashes
    seeds = [f"{s}:".encode() for s in range(nh)]

    def fold(batches):
        """Arrow-native kernel (r7 follow-up): the occurrence shingle
        stream never becomes Python objects. Per batch, shingles are built
        by joining n zero-copy SLICES of the flat token-value buffer
        (``binary_join_element_wise`` — byte-identical to
        ``" ".join(toks[i:i+n])``) with a boolean mask dropping the n−1
        start positions per row whose window would cross into the next
        doc; ``dictionary_encode`` (one C pass) maps occurrences to
        distinct-shingle codes. Only the ≤|distinct| dictionary strings
        touch Python — for the md5s, computed once per NEW distinct
        shingle through the bounded per-worker memo (min over occurrences
        == min over the distinct set, so no per-doc dedup is needed) —
        and one reduceat folds the per-doc minima. Measured on the 50k-doc
        sf1.0 corpus: the retired mapInPandas kernel spent 1.9 s/core
        materializing token lists + 0.6 s joining in Python + 0.6 s
        factorizing over object arrays; this kernel runs the identical
        math in 0.84 s/core with bit-identical output."""
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        cache: dict = {}
        md5 = hashlib.md5
        names = ["doc_id"] + [f"_m{s}" for s in range(nh)]

        def hash_fold(occ, ck):
            """occurrence shingles (Arrow) + per-kept-row counts → per-row
            min-hash matrix via the md5 memo."""
            enc = occ.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = enc.dictionary.to_pylist()
            Hm = np.empty((len(uniq), nh), dtype=np.int64)
            for j, sh in enumerate(uniq):
                h = cache.get(sh)
                if h is None:
                    if len(cache) >= _SHINGLE_CACHE_MAX:
                        cache.clear()
                    b = sh.encode()
                    h = np.array(
                        [int(md5(sd + b).hexdigest()[:15], 16)
                         for sd in seeds], dtype=np.int64)
                    cache[sh] = h
                Hm[j] = h
            starts = np.zeros(len(ck), dtype=np.int64)
            np.cumsum(ck[:-1], out=starts[1:])
            return np.minimum.reduceat(Hm[codes], starts, axis=0)

        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("toks"))
            ids_np = (rb.column(rb.schema.get_field_index("doc_id"))
                      .to_numpy(zero_copy_only=False).astype(np.int64))
            if arr.null_count:
                # rare (null text): the original per-row Python path —
                # identical semantics, no Arrow window math over null slots
                ids_out, sh_all, ck_list = [], [], []
                for doc_id, toks in zip(ids_np, arr.to_pylist()):
                    if toks is None:
                        continue
                    L = len(toks) - (n - 1)
                    if L <= 0:
                        continue
                    if n > 1:
                        sh_all.extend(
                            " ".join(toks[i:i + n]) for i in range(L))
                    else:
                        sh_all.extend(toks)
                    ids_out.append(doc_id)
                    ck_list.append(L)
                if not ids_out:
                    continue
                kept_ids = np.asarray(ids_out, dtype=np.int64)
                ck = np.asarray(ck_list, dtype=np.int64)
                occ = pa.array(sh_all, pa.string())
            else:
                offs = (arr.offsets.to_numpy(zero_copy_only=False)
                        .astype(np.int64))
                flat = arr.values
                base = offs[0]
                if base or len(flat) != offs[-1]:
                    flat = flat.slice(base, offs[-1] - base)
                    offs = offs - base
                counts = (offs[1:] - offs[:-1]) - (n - 1)
                keep = counts > 0
                if not keep.any():
                    continue
                m = len(flat) - n + 1
                if n > 1:
                    joined = pc.binary_join_element_wise(
                        *[flat.slice(j, m) for j in range(n)], " ")
                else:
                    joined = flat
                mask = np.ones(m, dtype=bool)
                for jj in range(1, n):
                    pos = offs[1:] - jj
                    mask[pos[(pos >= 0) & (pos < m)]] = False
                occ = joined.filter(pa.array(mask)) if not mask.all() \
                    else joined
                kept_ids = ids_np[keep]
                ck = counts[keep]
                if len(occ) != int(ck.sum()):  # exactness over speed
                    raise ValueError(
                        f"shingle window mismatch: {len(occ)} occurrences "
                        f"vs {int(ck.sum())} expected")
            mins = hash_fold(occ, ck)
            yield pa.RecordBatch.from_arrays(
                [pa.array(kept_ids, pa.int64())]
                + [pa.array(np.ascontiguousarray(mins[:, s]), pa.int64())
                   for s in range(nh)], names=names)

    schema = "doc_id long, " + ", ".join(f"_m{s} long" for s in range(nh))
    wide = toks_df.mapInArrow(fold, schema)
    # exactness guard: a corpus with duplicate doc_id rows must still yield
    # ONE row per doc (min over the union of copies' shingles), as the old
    # doc-keyed aggregation did. The rows here are |docs| × (H+1) longs —
    # a partial-agg-friendly exchange ~50× narrower than the old shingle
    # stream, and AQE coalesces it to a handful of tasks.
    return wide.groupBy("doc_id").agg(*[
        F.min(f"_m{s}").alias(f"_m{s}") for s in range(nh)
    ])


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 4,
                       shingle_n: int = 3) -> DataFrame:
    """(doc_id, seed, minhash) — num_hashes independent min-hashes.
    Values are identical to the r6 crossJoin formulation (same
    md5(seed || ':' || shingle) per seed); the row form is unpivoted from
    the one-pass wide aggregate (see _minhash_wide)."""
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    stack = "stack({}, {}) as (seed, minhash)".format(
        num_hashes, ", ".join(f"{s}, _m{s}" for s in range(num_hashes)))
    return wide.select("doc_id", F.expr(stack))


def _band_buckets(df: DataFrame, text_col: str, id_col: str,
                  num_hashes: int, rows_per_band: int,
                  shingle_n: int) -> DataFrame:
    """(doc_id, band, bucket) — the LSH banding shared by the candidate
    join and the guard-audit metrics.

    Buckets are computed as a PROJECTION over the wide minhash row (r7):
    each band's signature array is assembled from its seeds' columns in
    ascending-seed order — exactly what sort_array(collect_list(struct(
    seed, minhash))) produced, since seeds are unique per doc — and md5'd
    through the same to_json rendering. The per-(doc, band) collect_list
    shuffle and the (doc, seed) unpivot shuffle both disappear; values are
    identical."""
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = (num_hashes + rows_per_band - 1) // rows_per_band
    entries = F.array(*[
        F.struct(
            F.lit(b).cast("int").alias("band"),
            F.md5(F.to_json(F.array(*[
                F.struct(F.lit(s).cast("int").alias("seed"),
                         F.col(f"_m{s}").alias("minhash"))
                for s in range(b * rows_per_band,
                               min((b + 1) * rows_per_band, num_hashes))
            ]))).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    return (wide.select("doc_id", F.explode(entries).alias("e"))
            .select("doc_id", F.col("e.band").alias("band"),
                    F.col("e.bucket").alias("bucket")))


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 8,
                        rows_per_band: int = 2, shingle_n: int = 3,
                        max_bucket: int = 1000) -> DataFrame:
    """MinHash-LSH near-dup candidates → (doc_a, doc_b).

    Bands of ``rows_per_band`` signature rows; docs sharing a full band land
    in the same bucket; pairs emitted per bucket (guarded by max_bucket —
    audit what the guard excluded with ``lsh_guard_metrics``)."""
    band = _band_buckets(df, text_col, id_col, num_hashes, rows_per_band,
                         shingle_n)
    # ONE bucket-keyed aggregation replaces the r6 window-count guard + self-
    # join (three exchanges of the band rows → one): per (band, bucket) the
    # member ids are collected (partial-agg friendly, bucket sizes bounded by
    # near-dup cluster sizes), the max_bucket guard is a size() filter on the
    # same row, and the |b|² pair expansion is a pure-codegen nested
    # transform over the sorted id array — identical (doc_a < doc_b) pairs,
    # same guard semantics, then the same cross-band distinct.
    grouped = (band.groupBy("band", "bucket")
               .agg(F.collect_list("doc_id").alias("ids"))
               .where(F.size("ids").between(2, max_bucket)))
    pairs = grouped.select(F.explode(F.expr(
        "flatten(transform(array_sort(ids), (a, i) -> "
        "transform(slice(array_sort(ids), i + 2, size(ids)), "
        "b -> struct(a as doc_a, b as doc_b))))")).alias("p"))
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def lsh_guard_metrics(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      rows_per_band: int = 2, shingle_n: int = 3,
                      max_bucket: int = 1000) -> DataFrame:
    """One-row audit of what ``lsh_candidate_pairs``' silent guards excluded
    (the brief's no-silent-caps rule): at 100 TB a run must be able to
    report how many docs produced no shingles (< shingle_n tokens) and how
    many degenerate buckets (> max_bucket members) were dropped, instead of
    reading as full coverage.

    → (docs_total, docs_without_shingles, buckets_total, dropped_buckets,
       dropped_band_rows). Same inputs as lsh_candidate_pairs; all partial-
       agg-friendly counts."""
    ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    sh_ids = shingles(df, text_col, id_col, shingle_n).select("doc_id").distinct()
    doc_counts = (
        ids.join(sh_ids.withColumn("_has", F.lit(1)), "doc_id", "left")
        .agg(F.count("*").alias("docs_total"),
             F.sum(F.when(F.col("_has").isNull(), 1).otherwise(0))
             .cast("long").alias("docs_without_shingles"))
    )
    sizes = (
        _band_buckets(df, text_col, id_col, num_hashes, rows_per_band,
                      shingle_n)
        .groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    )
    bucket_counts = sizes.agg(
        F.count("*").cast("long").alias("buckets_total"),
        F.sum(F.when(F.col("bsz") > max_bucket, 1).otherwise(0))
        .cast("long").alias("dropped_buckets"),
        F.sum(F.when(F.col("bsz") > max_bucket, F.col("bsz")).otherwise(0))
        .cast("long").alias("dropped_band_rows"),
    )
    return doc_counts.crossJoin(bucket_counts)


def simhash(tf: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash) from a (doc_id, term, tf) stream.

    All ``bits`` signed tallies are aggregate columns of ONE doc-keyed
    groupBy (r7) — the r6 form exploded every (doc, term) row ×bits and
    shuffled twice ((doc, bit) then doc); the per-bit sums and the
    assembled signature are integer-identical."""
    th = tf.withColumn("h", md5_long(F.col("term")))
    wide = th.groupBy("doc_id").agg(*[
        F.sum(F.when(F.expr(f"(h >> {b}) & 1") == 1, F.col("tf"))
              .otherwise(-F.col("tf"))).alias(f"_s{b}")
        for b in range(bits)
    ])
    sig = None
    for b in range(bits):
        term = (F.when(F.col(f"_s{b}") > 0,
                       F.expr(f"cast(1 as bigint) << {b}"))
                .otherwise(F.lit(0).cast("bigint")))
        sig = term if sig is None else sig + term
    return wide.select("doc_id", sig.cast("long").alias("simhash"))


def jaccard_pairs(token_sets: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for given candidate pairs.

    token_sets: (doc_id, term) DISTINCT; pairs: (doc_a, doc_b).
    → (doc_a, doc_b, jaccard). The candidate set (from LSH) keeps this join
    linear in |pairs|, never quadratic in docs."""
    sizes = token_sets.groupBy("doc_id").agg(F.count("*").alias("c"))
    ta = token_sets.select(F.col("doc_id").alias("doc_a"), "term")
    tb = token_sets.select(F.col("doc_id").alias("doc_b"), "term")
    inter = (
        pairs.join(ta, "doc_a").join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b",
                F.round(F.col("inter") / (F.col("ca") + F.col("cb") - F.col("inter")),
                        6).alias("jaccard"))
    )


def connected_components(pairs: DataFrame, id_a: str = "doc_a",
                         id_b: str = "doc_b",
                         max_iter: int = 25,
                         check_every: int = 1) -> DataFrame:
    """Resolve near-duplicate candidate PAIRS into duplicate CLUSTERS:
    → (doc_id, component) where ``component`` is the smallest doc id
    reachable through the pair graph (the cluster's canonical keeper).

    The missing last step of the near-dup family: ``lsh_candidate_pairs`` /
    ``embedding_near_dup_pairs`` emit edges, but a curation pipeline keeps
    ONE doc per transitive cluster (A~B, B~C ⇒ drop two of {A,B,C} even
    though A,C never paired).

    Algorithm: iterative min-label propagation WITH pointer jumping, as
    DataFrame joins — each round every node takes the min of its own label,
    its neighbors' labels, and its label's label (path halving). A label is
    always the id of a node in the same component, so the jump is sound,
    and it turns O(diameter) convergence into **O(log diameter)** rounds (a
    100-doc near-dup chain — templated documents pairing transitively —
    converges in ~8 rounds, not 100). Convergence is checked exactly via a
    changed-label count per round, bounded by ``max_iter``; at the fixed
    point both endpoints of every edge share a label that can only be the
    component minimum (labels never increase and stay within the
    component). Scale shape: each round is two joins keyed by node/label —
    never an all-pairs structure — with localCheckpoint truncating the
    iterative lineage. The alternating small-star/large-star construction
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    remains the reference for graphs too large for per-round convergence
    counting. Raises after ``max_iter`` non-converged rounds rather than
    returning partial components.

    ``check_every`` amortizes the exact per-round convergence count for huge
    graphs: the fixed point is detected at most ``check_every - 1`` rounds
    late (the update is deterministic and monotone — one round with zero
    changed labels IS the fixed point, so a later check is still exact).

    Memory discipline (ADVICE r5): each superseded round's checkpointed
    label blocks are explicitly unpersisted once the next round has
    materialized and its convergence check (which joins the old labels) has
    run — storage high-water is O(|edges| + 2·|nodes|) blocks, not
    O(rounds·|nodes|). Caveat: ``localCheckpoint`` truncates lineage into
    executor-local blocks, so an executor loss mid-computation is
    unrecoverable (the job fails and must be rerun) — the standard trade for
    iterative algorithms; use reliable ``checkpoint()`` to an HDFS dir if
    executor churn is expected.
    """
    sc = pairs.sparkSession.sparkContext

    def _persistent_ids() -> set:
        return {int(i) for i in
                sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _checkpoint(df: DataFrame) -> "tuple[DataFrame, set]":
        # localCheckpoint() gives no handle on the blocks it pins; diff the
        # session's persistent-RDD ids around the call so the superseded
        # round can be freed explicitly. The diff is only sound if nothing
        # else persists between the two snapshots — the codebase itself runs
        # concurrent stages in threads (build_index), so the window is
        # guarded by a process-wide lock instead of an unenforced
        # single-writer assumption (ADVICE r6: an unrelated localCheckpoint
        # landing in the diff would be unpersisted mid-job, which for a
        # lineage-truncated RDD is unrecoverable).
        with _CHECKPOINT_DIFF_LOCK:
            before = _persistent_ids()
            out = df.localCheckpoint()
            return out, _persistent_ids() - before

    def _free(ids: set) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for i in ids:
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(False)

    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    e = pairs.select(F.col(id_a).cast("long").alias("src"),
                     F.col(id_b).cast("long").alias("dst"))
    # localCheckpoint per round truncates the iterative lineage — without it
    # the logical plan DOUBLES every round (labels references last round's
    # labels twice) and plan compilation itself OOMs around round ~15; with
    # it every round plans against a materialized table. The checkpointed
    # blocks live on executors (no driver collect), sized |nodes| rows.
    edges, edge_ids = _checkpoint(e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct())
    labels, label_ids = _checkpoint(
        edges.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
    )
    try:
        for rnd in range(1, max_iter + 1):
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src").agg(F.min("label").alias("nbr_label"))
            )
            # pointer jumping (path halving): also adopt label(label(node)) —
            # a label is always a node of the same component, so this is sound
            # and turns O(diameter) convergence into O(log diameter) (a
            # 100-long near-dup chain converges in ~8 rounds, not 100)
            jump = labels.select(F.col("node").alias("jn"),
                                 F.col("label").alias("jl"))
            new_labels, new_ids = _checkpoint(
                labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
                .join(jump, labels["label"] == jump["jn"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nbr_label"), F.col("label")),
                        F.coalesce(F.col("jl"), F.col("label")),
                    ).alias("label"),
                )
            )
            check = (rnd % check_every == 0) or rnd == max_iter
            changed = None
            if check:
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "node")
                    .where(F.col("n.label") != F.col("o.label"))
                    .count()
                )
            # the old round is fully superseded: new_labels is materialized
            # (eager checkpoint) and the convergence join above has run
            _free(label_ids)
            labels, label_ids = new_labels, new_ids
            if check and changed == 0:
                return labels.select(F.col("node").alias("doc_id"),
                                     F.col("label").alias("component"))
    finally:
        # the result only references the final labels checkpoint; the edge
        # blocks are dead weight either way
        _free(edge_ids)
    _free(label_ids)  # non-converged: nothing is returned, free the labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def near_dup_keepers(docs: DataFrame, components: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Join cluster resolution back onto the corpus:
    → (doc_id, keeper_doc_id, is_dup). Docs in no cluster keep themselves;
    clustered docs point at the component minimum. The downstream curation
    filter is simply ``WHERE NOT is_dup``."""
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(components, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("keeper_doc_id"),
        )
    )
    return out.withColumn("is_dup", (F.col("doc_id") != F.col("keeper_doc_id")))


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Paragraph-level exact dedup (the CCNet/FineWeb boilerplate-removal
    step, Wenzek et al. 2020 §3.1): split each document on ``sep``, keep a
    paragraph occurrence only if it is the corpus-wide FIRST occurrence of
    its normalized (lower+trim) form, and rebuild documents from the kept
    paragraphs in their original order. Headers, footers, cookie banners
    and license boilerplate repeated across billions of pages disappear
    while the first copy survives.

    → (doc_id, clean_text, n_paras, n_kept, n_removed); n_* count
    non-empty-after-trim paragraphs only.

    Scale shape: ONE shuffle keyed by the normalized paragraph (groupBy →
    min(struct(doc_id, pos)) — map-side partial combine collapses hot
    boilerplate keys before the exchange), one join back keyed the same
    way, then a doc-keyed rebuild (array_sort over collected (pos, para)
    structs — JVM expressions, no Python). Never all-pairs; the
    first-occurrence table is |distinct paragraphs|, not |occurrences|.
    """
    paras = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            # sep is used as a LITERAL both here and in the array_join
            # rebuild — \Q..\E quoting keeps the two consistent for
            # regex-meaningful separators ('.', '||', ...), which previously
            # split as a regex but rebuilt literally, corrupting clean_text
            # for any sep other than the default '\n' (ADVICE r6)
            F.posexplode(F.split(
                F.col(text_col),
                "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"))
            .alias("pos", "para"),
        )
        .withColumn("key", F.lower(F.trim("para")))
        .where(F.col("key") != "")
    )
    first = paras.groupBy("key").agg(
        F.min(F.struct("doc_id", "pos")).alias("first"))
    kept = (
        paras.join(first, "key")
        .where((F.col("doc_id") == F.col("first.doc_id"))
               & (F.col("pos") == F.col("first.pos")))
        .select("doc_id", "pos", "para")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.expr("array_join(transform(array_sort(collect_list(struct(pos, para))),"
               " s -> s.para), '{}')".format(sep.replace("'", "\\'")))
        .alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = paras.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.coalesce("n_paras", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .alias("n_removed"),
        )
    )
