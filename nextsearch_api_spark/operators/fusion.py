"""Hybrid-retrieval rank fusion: combine lexical (BM25) and vector
(cosine/ANN) result lists into one ranking.

The reference serves its lexical tier (``src/api_engine.cpp``) and its
embedding tier (``src/semantic_embedding.cpp``) as separate endpoints; a
modern retrieval stack fuses them. Two published fusion rules:

- ``rrf_fuse`` — reciprocal-rank fusion (Cormack, Clarke & Büttcher,
  SIGIR 2009): score(d) = Σ_lists w_i / (k + rank_i(d)). Rank-only, so it
  needs no score calibration between BM25 (unbounded) and cosine ([-1,1])
  — the reason RRF is the default hybrid rule in most engines.
- ``linear_fuse`` — weighted sum of min-max-normalized scores (the
  "convex combination" rule); score-sensitive, for when the magnitudes
  carry signal.

Scale shape: inputs are the TOP-K OUTPUTS of the retrieval tiers (≤ k
rows per list per query), so fusion operates on Σ|lists|·k rows — bounded
by construction, never corpus-sized. The union + groupBy is one tiny
shuffle; the final ranking uses sort+limit (TakeOrderedAndProject — a
distributed partial top-k, no single-partition window) when ``topk`` is
given. Per-list normalization in ``linear_fuse`` is a 1-row agg broadcast
back — no window over the list.
"""

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "linear_fuse", "mmr_rerank"]


def _check(rankings: list, weights: "list[float] | None") -> list:
    if not rankings:
        raise ValueError("rankings must be a non-empty list of DataFrames")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError("weights must match rankings 1:1")
    if any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative")
    return [float(w) for w in weights]


def _rank_out(fused: DataFrame, id_col: str, score_name: str,
              topk: "int | None") -> DataFrame:
    order = [F.desc(F.round(score_name, 9)), F.asc("_id")]
    if topk is not None:
        # sort+limit → TakeOrderedAndProject: partition-local top-k then a
        # k-row driver merge — never a single-partition global sort
        fused = fused.orderBy(*order).limit(int(topk))
    # row_number window runs over ≤topk rows (or the full fused list when
    # topk is None — callers fusing unbounded lists should pass topk)
    w = Window.orderBy(*order)
    return (fused.withColumn("rank", F.row_number().over(w))
            .select("rank", F.col("_id").alias(id_col),
                    F.round(score_name, 6).alias(score_name), "n_lists"))


def rrf_fuse(rankings: "list[DataFrame]", k: int = 60,
             weights: "list[float] | None" = None, topk: "int | None" = None,
             id_col: str = "doc_id", rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion of ranked lists.

    Each input carries (``id_col``, ``rank_col``) with rank 1-based; a
    document absent from a list contributes 0 from it (the standard RRF
    convention). Returns (rank, id, rrf_score, n_lists) where ``n_lists``
    counts how many input lists retrieved the document — ties in
    rrf_score (round 9) break by ascending id, so the output is
    deterministic under any partitioning.
    """
    weights = _check(rankings, weights)
    if k <= 0:
        raise ValueError("rrf k must be positive")
    parts = [
        r.select(
            F.col(id_col).alias("_id"),
            (F.lit(w) / (F.lit(float(k)) + F.col(rank_col).cast("double"))
             ).alias("_s"))
        for w, r in zip(weights, rankings)
    ]
    fused = (reduce(DataFrame.unionByName, parts)
             .groupBy("_id")
             .agg(F.sum("_s").alias("rrf_score"),
                  F.count("*").cast("long").alias("n_lists")))
    return _rank_out(fused, id_col, "rrf_score", topk)


def mmr_rerank(candidates: DataFrame, lam: float = 0.5, k: int = 10,
               id_col: str = "doc_id", score_col: str = "score",
               vec_col: str = "embedding",
               group_col: "str | None" = None) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
    1998): greedily pick k results maximizing
    ``lam * relevance(d) - (1 - lam) * max_{s in selected} cos(d, s)``
    — relevance traded against redundancy with what's already picked.

    ``candidates`` carries (``id_col``, ``score_col``, ``vec_col``) — the
    TOP-K' OUTPUT of a retrieval tier with its embeddings reattached, so
    each group is ≤ k' rows. The greedy loop is inherently sequential
    WITHIN a group; the honest distributed shape is applyInPandas per
    ``group_col`` (per-query parallel, within-query a vectorized numpy
    O(k·n·d) pass) — never a corpus-sized operation. Pass relevance
    scores on a comparable scale (min-max normalize BM25 first if mixing
    tiers; cosine is already bounded).

    Determinism: the pick argument is rounded to 9 decimals and ties
    break on ascending id, matching the unrolled-SQL oracle. The first
    pick's objective is ``lam * score`` (no selected set yet). Zero-norm
    embeddings contribute cosine 0 (orthogonal). Returns
    (group?, rank, id, mmr_score) with mmr_score = the objective value at
    selection time, rounded to 6.
    """
    if not (0.0 <= lam <= 1.0):
        raise ValueError("lam must be in [0, 1]")
    if k <= 0:
        raise ValueError("k must be positive")
    grp = group_col if group_col is not None else "_g"
    t = candidates if group_col is not None else \
        candidates.withColumn("_g", F.lit(0))
    gtype = dict(t.dtypes)[grp]
    itype = dict(t.dtypes)[id_col]
    out_schema = (f"{grp} {gtype}, rank int, {id_col} {itype}, "
                  "mmr_score double")

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        U = V / norms
        s = pdf[score_col].astype(np.float64).to_numpy()
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        avail = np.ones(n, dtype=bool)
        # max cos to the selected set — None until the first pick: the max
        # over one element is that element's cosine, which may be NEGATIVE
        # (zero-init would silently clamp anti-correlated picks to 0)
        max_sim = None
        rows = []
        for rank in range(1, min(k, n) + 1):
            obj = lam * s if max_sim is None \
                else lam * s - (1.0 - lam) * max_sim
            key = np.round(obj, 9)
            # argmax with ties on ascending id: mask out taken rows
            key_m = np.where(avail, key, -np.inf)
            best = np.flatnonzero(key_m == key_m.max())
            pick = best[np.argmin(ids[best])]
            rows.append((pdf[grp].iloc[0], rank, ids[pick],
                         round(float(obj[pick]), 6)))
            avail[pick] = False
            sims_pick = U @ U[pick]
            max_sim = sims_pick if max_sim is None \
                else np.maximum(max_sim, sims_pick)
        return pd.DataFrame(rows, columns=[grp, "rank", id_col, "mmr_score"])

    out = (t.select(grp, id_col, score_col, vec_col)
           .groupBy(grp).applyInPandas(_mmr, out_schema))
    return out.drop("_g") if group_col is None else out


def linear_fuse(rankings: "list[DataFrame]",
                weights: "list[float] | None" = None,
                topk: "int | None" = None, id_col: str = "doc_id",
                score_col: str = "score") -> DataFrame:
    """Convex-combination fusion: per-list min-max normalize ``score_col``
    to [0, 1], then weighted sum. A constant-score list (max == min)
    normalizes to 1.0 for every member — presence is its only signal.

    Returns (rank, id, fused_score, n_lists), ties broken by ascending id.
    """
    weights = _check(rankings, weights)
    parts = []
    for w, r in zip(weights, rankings):
        mm = r.agg(F.min(F.col(score_col).cast("double")).alias("_mn"),
                   F.max(F.col(score_col).cast("double")).alias("_mx"))
        norm = F.when(
            F.col("_mx") > F.col("_mn"),
            (F.col(score_col).cast("double") - F.col("_mn"))
            / (F.col("_mx") - F.col("_mn"))).otherwise(F.lit(1.0))
        parts.append(
            r.crossJoin(F.broadcast(mm))
            .select(F.col(id_col).alias("_id"), (F.lit(w) * norm).alias("_s")))
    fused = (reduce(DataFrame.unionByName, parts)
             .groupBy("_id")
             .agg(F.sum("_s").alias("fused_score"),
                  F.count("*").cast("long").alias("n_lists")))
    return _rank_out(fused, id_col, "fused_score", topk)
