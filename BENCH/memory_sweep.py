#!/usr/bin/env python
"""No-Spark scaling sweep of the build's hot Arrow string kernels.

The build pipeline's multi-core knee (BENCH/BASELINE.md) is attributed to
DRAM-bandwidth saturation of the Arrow string kernels, not to any exchange
or serialization in the Spark plan. This script is the evidence (VERDICT r2
#4): it runs the EXACT tokenize kernel sequence from the segment postings
builder (operators/build.py build_posting_chunks_segment — utf8_lower →
split_pattern_regex → length/stopword filter → dictionary_encode) in plain
multiprocessing workers, each pinned to its own core, with NO Spark, NO
shuffle, NO Python-string materialization. Every worker gets an identical,
independent in-memory Arrow array, so the workload is embarrassingly
parallel by construction — any sub-linear scaling is the MACHINE (memory
bandwidth / SMT / hypervisor steal), not the pipeline.

Usage:
    python BENCH/memory_sweep.py [--corpus DIR] [--points 1,2,4,8,16]
                                 [--repeats 3] [--mb 64]

Writes BENCH/memory_sweep.json:
    {"points": {"1": {"best_seconds": ..., "mb_per_sec_total": ...,
                      "efficiency_vs_1": ..., "steal_pct_runs": [...]},
                ...},
     "docs_per_worker": N, "mb_per_worker": ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_content(corpus: str | None, target_mb: float) -> list[str]:
    """Content strings for one worker (~target_mb of UTF-8)."""
    if corpus and os.path.isdir(corpus):
        import pyarrow.dataset as ds
        t = ds.dataset(corpus, format="parquet").to_table(columns=["content"])
        out, total = [], 0
        for s in t.column("content").to_pylist():
            out.append(s)
            total += len(s)
            if total >= target_mb * 1e6:
                break
        if out:
            return out
    # deterministic synthetic fallback shaped like the bench corpus
    # (zipf-ish vocab, ~2 KB docs) — only used when no corpus dir exists
    import numpy as np
    rng = np.random.default_rng(42)
    vocab = np.array([f"tok{i:05d}" for i in range(20_000)], dtype=object)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    out, total = [], 0
    while total < target_mb * 1e6:
        words = rng.choice(vocab, size=300, p=p)
        s = " ".join(words)
        out.append(s)
        total += len(s)
    return out


def _worker(core: int, docs: list[str], n_iter: int,
            q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    import pyarrow as pa
    import pyarrow.compute as pc

    from nextsearch_api_spark.functions.text import STOPWORDS
    sw = pa.array(list(STOPWORDS), type=pa.string())
    content = pa.array(docs, type=pa.string())

    # exact kernel sequence of build_posting_chunks_segment
    def kernel() -> int:
        toks = pc.split_pattern_regex(pc.utf8_lower(content), "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        keep = pc.and_kleene(
            pc.greater_equal(pc.utf8_length(flat), 2),
            pc.invert(pc.is_in(flat, value_set=sw)),
        )
        flat2 = pc.filter(flat, keep)
        enc = pc.dictionary_encode(flat2)
        return len(enc)

    kernel()  # warm (allocator, regex compile)
    t0 = time.time()
    for _ in range(n_iter):
        kernel()
    q.put(time.time() - t0)


def _steal_ticks() -> tuple[int, int]:
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="parquet corpus dir (content column); synthetic if absent")
    ap.add_argument("--points", default="1,2,4,8,16")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mb", type=float, default=64,
                    help="MB of content per worker")
    ap.add_argument("--iters", type=int, default=3,
                    help="kernel passes per timed run")
    args = ap.parse_args()

    points = sorted({int(x) for x in args.points.split(",") if x})
    docs = _load_content(args.corpus, args.mb)
    mb = sum(len(s) for s in docs) / 1e6
    print(f"content: {len(docs)} docs, {mb:.1f} MB per worker", file=sys.stderr)

    ctx = mp.get_context("spawn")
    results: dict[str, dict] = {}
    for c in points:
        runs, steals = [], []
        for _ in range(args.repeats):
            s0, t0ticks = _steal_ticks()
            q = ctx.Queue()
            procs = [ctx.Process(target=_worker, args=(i, docs, args.iters, q))
                     for i in range(c)]
            t0 = time.time()
            for p in procs:
                p.start()
            times = [q.get() for _ in procs]
            for p in procs:
                p.join()
            wall = time.time() - t0
            s1, t1ticks = _steal_ticks()
            runs.append(max(times))  # slowest worker = the honest wall
            steals.append(round(100.0 * (s1 - s0) / max(1, t1ticks - t0ticks), 2))
            del wall
        best = min(runs)
        results[str(c)] = {
            "best_seconds": round(best, 3),
            "all_seconds": [round(x, 3) for x in runs],
            "mb_per_sec_total": round(c * mb * args.iters / best, 1),
            "steal_pct_runs": steals,
        }
        print(f"c={c}: best {best:.2f}s  total {results[str(c)]['mb_per_sec_total']} MB/s"
              f"  steal {steals}", file=sys.stderr)

    base = results[str(points[0])]["mb_per_sec_total"] / points[0]
    for c in points:
        r = results[str(c)]
        r["efficiency_vs_1"] = round(r["mb_per_sec_total"] / (c * base), 3)

    out = {
        "kernel": "utf8_lower|split_pattern_regex|len>=2|stopword|dict_encode",
        "docs_per_worker": len(docs),
        "mb_per_worker": round(mb, 1),
        "iters_per_run": args.iters,
        "repeats": args.repeats,
        "points": results,
        "note": ("each worker pinned to its own core with an independent "
                 "in-memory copy of the data; zero shared state, zero Spark — "
                 "sub-linear points are machine limits (DRAM bandwidth/steal)"),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "memory_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"wrote": path,
                      "efficiency_vs_1": {c: results[str(c)]["efficiency_vs_1"]
                                          for c in map(str, points)}}))


if __name__ == "__main__":
    main()
