"""Multi-segment serving — reference parity for N-segment engines.

The reference engine loads N independent segments, each carrying its OWN
lexicon, postings and collection stats, scores every segment with
segment-LOCAL idf/avgdl, and merges the per-segment candidates into one
global top-k (/root/reference/src/api_engine.cpp:441-495 loads and
dispatches per segment; src/api_segment.cpp:105-136 scores with the
segment's own N and avgdl; found is the sum of per-segment matched counts).

The canonical deployment is ONE segment (the reference's shipped config),
and `api.Engine` keeps that shape — SURVEY §7.3 canonicalizes scoring to
global stats, which is bit-identical when N==1. This module closes the
remaining divergence for users who DO run multiple segments: each segment
directory here is a full index built by ``build_index`` (its stats.json IS
the segment-local stats), wrapped in its own WandEngine, so segment-local
scoring falls out of the existing machinery instead of being a second code
path.

Merge semantics mirror the reference's heap merge: candidates ordered by
(score desc, segment order asc, doc_id asc); ``found`` sums per-segment
counts (the reference's ``total_found`` accumulation); ``segments`` in the
response reports N. Result rows carry a ``segment`` index because doc_ids
are segment-local (each build numbers 1..N_seg), exactly like the
reference's per-segment doc indexes.

Scale shape: segments serve independently (driver-side WAND each), so a
multi-segment tier shards by segment; the distributed batch tier remains
the cluster path for one logical index.
"""

from __future__ import annotations

import bisect
import threading

from nextsearch_api_spark.config import (
    SUGGEST_MAX_PREFIX_LEN, SUGGEST_TOP_PER_PREFIX,
)
from nextsearch_api_spark.operators.query import clamp_k
from nextsearch_api_spark.operators.wand import WandEngine

_PREFIX_TOP = SUGGEST_TOP_PER_PREFIX


class MultiSegmentEngine:
    """N independent index segments served as one engine.

    Serving-tier state (the merged suggest structures) is built ONCE,
    lazily, under an engine lock — the same discipline as ``api.Engine``'s
    suggester (VERDICT r3 #2 / ADVICE r3): segments are immutable per
    engine instance, so per-call rebuilds were pure waste on the
    autocomplete path."""

    def __init__(self, roots: list[str]):
        if not roots:
            raise ValueError("at least one segment root required")
        self.roots = list(roots)
        self.segments = [WandEngine(r) for r in self.roots]
        self._lock = threading.RLock()
        self._merged_df: dict[str, int] | None = None
        self._prefix_table: dict[str, list[str]] | None = None
        self._sorted_terms: list[str] | None = None

    # ------------------------------------------------------------- search --
    def search(self, query: str, k: int = 10, mode: str = "auto",
               hydrate: bool = False) -> dict:
        """Segment-local scoring + global merge (reference semantics)."""
        kk = clamp_k(k)
        found = 0
        cands: list[tuple[float, int, int]] = []  # (-score, seg, doc_id)
        for si, seg in enumerate(self.segments):
            r = seg.search(query, kk, mode=mode)
            found += int(r["found"])
            for item in r["results"]:
                cands.append((-float(item["score"]), si, int(item["doc_id"])))
        cands.sort()
        results = [
            {"rank": i + 1, "doc_id": d, "segment": s, "score": -ns}
            for i, (ns, s, d) in enumerate(cands[:kk])
        ]
        out = {
            "query": query,
            "k": kk,
            "segments": len(self.segments),
            "found": found,
            "results": results,
        }
        return self._hydrate(out) if hydrate else out

    def _hydrate(self, out: dict) -> dict:
        """Per-segment doc-metadata join (reference hydration reads each
        hit's metadata from ITS segment's doc store, api_engine.cpp:508-532;
        left-join semantics — missing meta tolerated). Bounded driver-side
        pyarrow isin fetch per segment, same as the single-segment Engine."""
        if not out["results"]:
            return out
        import pyarrow.dataset as pads

        by_seg: dict[int, list[int]] = {}
        for r in out["results"]:
            by_seg.setdefault(r["segment"], []).append(r["doc_id"])
        for si, ids in by_seg.items():
            meta = pads.dataset(self.segments[si].paths.docs).to_table(
                columns=["doc_id", "uid", "repo", "path", "commit", "lang"],
                filter=pads.field("doc_id").isin(ids),
            ).to_pandas().set_index("doc_id")
            for r in out["results"]:
                if r["segment"] == si and r["doc_id"] in meta.index:
                    row = meta.loc[r["doc_id"]]
                    r.update(uid=row["uid"], repo=row["repo"],
                             path=row["path"], commit=row["commit"],
                             lang=row["lang"])
        return out

    # ------------------------------------------------------------ suggest --
    def merged_suggest_df(self) -> "dict[str, int]":
        """term → summed df across segments (the reference's cross-segment
        df aggregation, SURVEY §2 A4) — built once per engine instance
        (segments are immutable) under the engine lock."""
        if self._merged_df is None:
            with self._lock:
                if self._merged_df is None:
                    total: dict[str, int] = {}
                    for seg in self.segments:
                        for term, df in seg._df.items():
                            total[term] = total.get(term, 0) + int(df)
                    self._merged_df = total
        return self._merged_df

    def _suggest_structures(self) -> tuple[dict[str, list[str]], list[str]]:
        """(prefix → top-SUGGEST_K completions, sorted term list), memoized.

        The prefix table serves prefixes up to SUGGEST_MAX_PREFIX_LEN in
        O(1); longer prefixes bisect the sorted term list to the exact
        prefix range (O(log vocab) + range scan over that narrow range) —
        never a full-vocab scan per call."""
        if self._prefix_table is None:
            with self._lock:
                if self._prefix_table is None:
                    df = self.merged_suggest_df()
                    by_prefix: dict[str, list[tuple[int, str]]] = {}
                    for term, c in df.items():
                        for i in range(1, min(len(term),
                                              SUGGEST_MAX_PREFIX_LEN) + 1):
                            by_prefix.setdefault(term[:i], []).append((-c, term))
                    table: dict[str, list[str]] = {}
                    for p, v in by_prefix.items():
                        v.sort()
                        table[p] = [t for _, t in v[:_PREFIX_TOP]]
                    self._sorted_terms = sorted(df)
                    self._prefix_table = table
        return self._prefix_table, self._sorted_terms

    def suggest(self, prefix: str, k: int = 10) -> list[str]:
        """Top-k completions by (summed df desc, term asc) over the merged
        lexicons — the engine-level view of per-segment vocabularies."""
        table, terms = self._suggest_structures()
        p = prefix.lower()
        if not p:
            df = self.merged_suggest_df()
            hits = sorted(df.items(), key=lambda tc: (-tc[1], tc[0]))
            return [t for t, _ in hits[:k]]
        if len(p) <= SUGGEST_MAX_PREFIX_LEN and k <= _PREFIX_TOP:
            return table.get(p, [])[:k]
        # long-prefix / large-k path: exact scan over the bisected range only
        lo = bisect.bisect_left(terms, p)
        hi = bisect.bisect_left(terms, p[:-1] + chr(ord(p[-1]) + 1))
        df = self.merged_suggest_df()
        hits = sorted(terms[lo:hi], key=lambda t: (-df[t], t))
        return hits[:k]

    # -------------------------------------------------------------- stats --
    def health(self) -> dict:
        return {
            "ok": True,
            "segments": len(self.segments),
            "docs": sum(s.N for s in self.segments),
        }
