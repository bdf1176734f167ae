"""Golden oracle: pure pandas/NumPy reference implementation of the
reference engine's search pipeline, for rank-identity testing.

Replicates, step for step (canonicalized per SURVEY.md §7.3):
  1. tokenize query: lowercase [a-z0-9]+ runs        (textutil.hpp:13-28)
  2. drop len<2 and stopwords                        (api_engine.cpp:391-397)
  3. per surviving term occurrence, weight 1.0 (expansion disabled path,
     api_engine.cpp:418-421; repeated terms score repeatedly via the loop at
     api_engine.cpp:449)
  4. idf = ln(1 + (N-df+0.5)/(df+0.5)) in float32    (api_engine.cpp:45-47)
  5. per-posting impact = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) in float32
                                                     (api_engine.cpp:478-479)
  6. TAAT accumulation score[doc] += w * idf * impact; the accumulation is
     float64 over float32 factors — the canonical tie-break-stable form
  7. top-k by (score desc, doc_id asc), k clamped to [1,100]
                                                     (api_engine.cpp:377,427-504)

Single logical segment: global N/avgdl/df (the reference's canonical
one-segment config; per-segment stats quirk documented in SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import pandas as pd

from nextsearch_api_spark.config import (
    BM25Params,
    MIN_TOKEN_LEN,
    SEARCH_K_MAX,
    SEARCH_K_MIN,
)
from nextsearch_api_spark.functions.text import (
    STOPWORD_SET as _SW,
    kept_tokens_py,
    tokenize_py,
)


@dataclass
class OracleIndex:
    """In-memory inverted index over a small corpus (tests only)."""

    N: int
    avgdl: np.float32
    doc_len: dict[int, int]
    postings: dict[str, "pd.DataFrame"]  # term -> DataFrame(doc_id, tf)
    df: dict[str, int] = field(default_factory=dict)

    @classmethod
    def build(cls, docs: pd.DataFrame, content_col: str = "content",
              id_col: str = "doc_id") -> "OracleIndex":
        rows: list[tuple[str, int, int]] = []
        doc_len: dict[int, int] = {}
        for did, content in zip(docs[id_col], docs[content_col]):
            toks = kept_tokens_py(content or "", MIN_TOKEN_LEN)
            if not toks:
                # reference drops zero-token docs at index time
                # (src/ForwardIndex.cpp:152) — they never enter docs.bin
                continue
            doc_len[int(did)] = len(toks)
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            rows.extend((t, int(did), c) for t, c in tf.items())
        pf = pd.DataFrame(rows, columns=["term", "doc_id", "tf"])
        postings = {
            t: g.sort_values("doc_id").reset_index(drop=True)
            for t, g in pf.groupby("term")
        }
        N = len(doc_len)
        avgdl = np.float32(sum(doc_len.values()) / N) if N else np.float32(0)
        return cls(
            N=N,
            avgdl=avgdl,
            doc_len=doc_len,
            postings=postings,
            df={t: len(g) for t, g in postings.items()},
        )

    def search(self, query: str, k: int = 10,
               params: BM25Params | None = None) -> pd.DataFrame:
        """Top-k: DataFrame(rank, doc_id, score:float32) + .attrs['found']."""
        p = params or BM25Params()
        k = max(SEARCH_K_MIN, min(int(k), SEARCH_K_MAX))
        terms = [
            t for t in tokenize_py(query)
            if len(t) >= MIN_TOKEN_LEN and t not in _SW
        ]
        scores: dict[int, float] = {}
        k1 = np.float32(p.k1)
        b = np.float32(p.b)
        one = np.float32(1.0)
        for t in terms:  # repeated terms accumulate repeatedly (weight 1.0)
            pl = self.postings.get(t)
            if pl is None:
                continue
            df = self.df[t]
            idf = np.float32(
                np.log(one + (np.float32(self.N - df) + np.float32(0.5))
                       / (np.float32(df) + np.float32(0.5)))
            )
            tf = pl["tf"].to_numpy().astype(np.float32)
            dl = np.array([self.doc_len[d] for d in pl["doc_id"]], dtype=np.float32)
            denom = tf + k1 * (one - b + b * (dl / self.avgdl))
            impact = (tf * (k1 + one) / denom).astype(np.float32)
            contrib = np.float64(1.0) * idf.astype(np.float64) * impact.astype(np.float64)
            for d, s in zip(pl["doc_id"].to_numpy(), contrib):
                scores[int(d)] = scores.get(int(d), 0.0) + float(s)
        found = len(scores)
        if not scores:
            out = pd.DataFrame(columns=["rank", "doc_id", "score"])
            out.attrs["found"] = 0
            return out
        res = pd.DataFrame(
            {"doc_id": list(scores.keys()), "score": list(scores.values())}
        )
        res["score"] = res["score"].astype(np.float64)
        res = res.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        res.insert(0, "rank", np.arange(1, len(res) + 1))
        res = res.reset_index(drop=True)
        res.attrs["found"] = found
        return res


def suggest_oracle(term_df: pd.DataFrame, prefix: str, k: int = 10,
                   max_per_prefix: int = 10) -> list[str]:
    """Autocomplete oracle: candidates with the given prefix ranked by
    (Σdf desc, term asc), top-``max_per_prefix`` per prefix then first k
    (reference: api_autocomplete.cpp:33-55,113-119; len≥2 filter :105-110)."""
    cand = term_df[term_df["term"].str.startswith(prefix)]
    cand = cand[cand["term"].str.len() >= 2]
    cand = cand.sort_values(["df", "term"], ascending=[False, True],
                            kind="mergesort").head(max_per_prefix)
    return cand["term"].head(k).tolist()
