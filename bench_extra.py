#!/usr/bin/env python
"""Round-7 optimization harness (guide §1.4): per-operator isolation for the
pipeline family + batch queries, SEPARATE from the frozen bench.py.

Times the exact operator invocations bench.py times (same params, same
action), one at a time, labeled via setJobDescription, with optional
``--explain`` to dump .explain("formatted") files into plans/r07/.

Usage:
  python bench_extra.py [--sf-dir /root/testdata/sf1.0] [--ops a,b,c]
                        [--repeats 2] [--explain] [--noop]

Env mirrors bench.py: SPARK_GRAFT_CPUS (default 32).
Output: one JSON line {"op": sec, ...} + per-op prints.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _mk_spark(cpus: int):
    # identical config to bench.py:_mk_spark (sf-independent parts)
    from pyspark.sql import SparkSession
    import tempfile
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"nextsearch-bench-extra-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.local.dir", os.path.join(base, "spark_local_extra"))
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--ops", default="")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--noop", action="store_true",
                    help="use noop sink instead of count() for DataFrame ops")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import numpy as np
    from pyspark.sql import functions as F

    from nextsearch_api_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures,
    )
    from nextsearch_api_spark.operators.multimodal import (
        extract_features, resize_images, synth_media,
    )
    from nextsearch_api_spark.operators.similarity import (
        ann_lsh_topk, build_ann_index, cosine_topk_batch,
        embedding_near_dup_pairs, semantic_dedup_pairs,
        pq_adc_topk, pq_encode, train_ivf_centroids, train_pq_codebooks,
    )
    from nextsearch_api_spark.operators.curation import (
        ngram_contamination, redact_pii,
    )
    from nextsearch_api_spark.operators.phrase import phrase_match
    from nextsearch_api_spark.operators.textstats import (
        bigram_lm_scores, repetition_signals,
    )

    sf_dir = args.sf_dir
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    media = synth_media(spark, 512)
    docs.cache().count(), emb.cache().count(), media.cache().count()

    import tempfile
    workdir = os.path.join(
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir(),
        "nsbench_extra")
    os.makedirs(workdir, exist_ok=True)
    ann_path = os.path.join(workdir, "ann_idx")
    H = build_ann_index(emb, ann_path, n_planes=8, seed=42)
    dim = len(emb.select("embedding").first()[0])
    qv = [float(x) for x in np.random.default_rng(7).standard_normal(dim)]

    def _sink(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            return df.count()

    def _pq_run():
        B = train_pq_codebooks(emb, m=4, ksub=16, seed=11,
                               max_iter=3, tol=0.0)
        return pq_adc_topk(pq_encode(emb, B), B, qv, k=10).count()

    # mirror of bench.py ops dict, but returning DataFrames where possible
    lazy_ops = {
        "minhash_signatures": lambda: minhash_signatures(docs, num_hashes=8),
        "lsh_candidate_pairs": lambda: lsh_candidate_pairs(
            docs, num_hashes=8, rows_per_band=2),
        "emb_near_dup": lambda: embedding_near_dup_pairs(
            emb, n_planes=8, tau=0.8),
        "semantic_dedup": lambda: semantic_dedup_pairs(
            emb, n_clusters=16, seed=7, train_iters=3, tau=0.8,
            max_cluster=100_000),
        "ann_lsh_probe": lambda: ann_lsh_topk(spark, ann_path, H, qv, k=10),
        "extract_features": lambda: extract_features(
            media, dim=16, fake=False, on_unsupported="skip"),
        "resize_images": lambda: resize_images(
            media, 16, 16, on_unsupported="skip"),
        "lm_perplexity": lambda: bigram_lm_scores(docs),
        "decontaminate": lambda: ngram_contamination(
            docs.where(F.col("doc_id") % 20 != 0),
            docs.where(F.col("doc_id") % 20 == 0), n=5),
        "repetition_signals": lambda: repetition_signals(docs),
        "redact_pii": lambda: redact_pii(docs),
        "phrase_match": lambda: phrase_match(docs, "fast table"),
        "cosine_batch8": lambda: cosine_topk_batch(
            emb, [(i, [float(x) for x in
                       np.random.default_rng(i).standard_normal(dim)])
                  for i in range(8)], k=10),
    }
    action_ops = {
        "train_ivf_3iter": lambda: train_ivf_centroids(
            emb, n_centroids=16, seed=7, max_iter=3, tol=0.0),
        "pq_train_encode_adc": _pq_run,
    }

    sel = [s for s in args.ops.split(",") if s] or \
        list(lazy_ops) + list(action_ops)
    times: dict[str, list[float]] = {}
    for name in sel:
        spark.sparkContext.setJobDescription(f"r07-extra: {name}")
        runs = []
        for i in range(args.repeats):
            t0 = time.time()
            if name in lazy_ops:
                _sink(lazy_ops[name]())
            else:
                action_ops[name]()
            runs.append(round(time.time() - t0, 3))
        times[name] = runs
        print(f"{name}: {runs}", file=sys.stderr)
        if args.explain and name in lazy_ops:
            os.makedirs("plans/r07", exist_ok=True)
            with open(f"plans/r07/{name}_explain.txt", "w") as f:
                f.write(lazy_ops[name]()._sc._jvm.PythonSQLUtils.explainString(
                    lazy_ops[name]()._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({k: min(v) for k, v in times.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
