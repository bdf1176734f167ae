"""Python API / CLI — the serving surface of the engine.

Mirrors the reference HTTP endpoints (src/api_server.cpp) at CLI/library
level per SURVEY.md §2.8: search (:117-178), suggest (:180-195), reload
(:203-210), health (:109-115), stats (:358-365). JSON shapes follow
README.md:72-116. The AI endpoints (/api/ai_overview, /api/ai_summary) call
an external LLM service in the reference (src/api_ai_overview.cpp) — out of
scope here; ``Engine.hooks`` exposes the integration point.

LRU result caching reproduces the reference's search cache semantics
(include/api_engine.hpp:38-60): capacity 2600, key = raw query string + "|" +
clamped k (api_engine.cpp:190-192,380-385 — note the RAW query: "Covid" and
"covid" are distinct entries, a documented reference quirk we keep), persisted
as JSON on every update (CACHE_SAVE_INTERVAL=1, api_engine.hpp:60).
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import OrderedDict
from typing import Any, Callable

from nextsearch_api_spark.config import BM25Params
from nextsearch_api_spark.feedback import FeedbackManager, validate_feedback
from nextsearch_api_spark.operators.query import clamp_k
from nextsearch_api_spark.operators.wand import WandEngine

SEARCH_CACHE_CAP = 2600        # reference: api_engine.hpp:42
AI_OVERVIEW_CACHE_CAP = 500    # reference: api_engine.hpp:48-49
AI_SUMMARY_CACHE_CAP = 1000    # reference: api_engine.hpp:54-55


class LruCache:
    def __init__(self, cap: int, persist_path: str | None = None):
        self.cap = cap
        self.persist_path = persist_path
        self.data: OrderedDict[str, Any] = OrderedDict()
        self.hits = 0
        self.misses = 0
        if persist_path and os.path.exists(persist_path):
            try:
                with open(persist_path) as f:
                    for k, v in json.load(f):
                        self.data[k] = v
            except Exception:
                pass

    def get(self, key: str):
        if key in self.data:
            self.data.move_to_end(key)
            self.hits += 1
            return self.data[key]
        self.misses += 1
        return None

    def put(self, key: str, value: Any) -> None:
        self.data[key] = value
        self.data.move_to_end(key)
        while len(self.data) > self.cap:
            self.data.popitem(last=False)
        if self.persist_path:  # save-every-update, like the reference
            tmp = self.persist_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(list(self.data.items()), f)
            os.replace(tmp, self.persist_path)


def _copy_response(out: dict) -> dict:
    """Copy a cached response deeply enough that callers (or AI hooks fed
    ``results``) can mutate result rows without corrupting the cached entry
    (ADVICE r3): the row dicts are the only shared mutable level."""
    out = dict(out)
    if isinstance(out.get("results"), list):
        out["results"] = [dict(r) if isinstance(r, dict) else r
                          for r in out["results"]]
    return out


class Engine:
    """Single-node serving engine over a built index (the reference
    Engine analog, api_engine.cpp:50-162 reload semantics)."""

    def __init__(self, index_root: str, params: BM25Params | None = None,
                 cache_dir: str | None = None,
                 embeddings_path: str | None = None):
        self.index_root = index_root
        self.params = params or BM25Params()
        self.cache_dir = cache_dir
        self.embeddings_path = embeddings_path
        self.hooks: dict[str, Callable] = {}  # e.g. 'ai_overview' integration
        self._counters = {"searches": 0, "suggests": 0, "reloads": 0,
                          "search_cache_hits": 0}
        # engine-wide mutex, like the reference's Engine::mtx
        # (api_engine.hpp:59): the HTTP layer serves one Engine from many
        # threads; cache get/put and counter updates are check-then-act
        # sequences that must not interleave (ADVICE r2)
        self._lock = threading.RLock()
        self.feedback_store = FeedbackManager(
            os.path.join(cache_dir, "feedback.json") if cache_dir else None
        )
        self._load()

    def _load(self) -> None:
        t0 = time.time()
        self.wand = WandEngine(self.index_root, self.params)
        if self.embeddings_path:
            self.wand.load_embeddings(self.embeddings_path)
        self._suggester = None  # lazy
        def _persist(name: str) -> str | None:
            if not self.cache_dir:
                return None
            os.makedirs(self.cache_dir, exist_ok=True)
            return os.path.join(self.cache_dir, name)

        self.search_cache = LruCache(SEARCH_CACHE_CAP,
                                     _persist("search_cache.json"))
        # AI response caches (reference: api_engine.hpp:46-57 — 500 overviews
        # keyed "query|k", 1000 summaries keyed "summary|uid", persisted on
        # every update like the search cache). Recreating on reload re-reads
        # the persisted entries, so cached AI responses survive /api/reload.
        self.ai_overview_cache = LruCache(AI_OVERVIEW_CACHE_CAP,
                                          _persist("ai_overview_cache.json"))
        self.ai_summary_cache = LruCache(AI_SUMMARY_CACHE_CAP,
                                         _persist("ai_summary_cache.json"))
        self.load_seconds = time.time() - t0

    # ----------------------------------------------------------- endpoints --

    def health(self) -> dict:
        return {
            "status": "ok",
            "segments": 1,
            "docs": self.wand.N,
            "avgdl": self.wand.avgdl,
        }

    def search(self, q: str, k: int = 10) -> dict:
        kk = clamp_k(k)
        key = f"{q}|{kk}"  # raw query string, reference quirk kept
        t0 = time.time()
        with self._lock:
            self._counters["searches"] += 1
            cached = self.search_cache.get(key)
            if cached is not None:
                self._counters["search_cache_hits"] += 1
                cached = _copy_response(cached)
        if cached is not None:
            # reference cached shape (api_server.cpp:141-165): search time
            # zeroed, the lookup cost reported separately
            out = cached
            out["search_time_ms"] = 0.0
            out["cache_lookup_ms"] = round((time.time() - t0) * 1000, 2)
            out["cached"] = True
            out["total_time_ms"] = round((time.time() - t0) * 1000, 2)
            return out
        t1 = time.time()
        out = self.wand.search(q, kk)
        # reference parity: `found` is the EXACT matched-doc count
        # (api_engine.cpp:495). The WAND path's found only counts docs it
        # scored (pruning skips the rest), so recover the exact union count;
        # TAAT results are already exact. (With semantic expansion active the
        # scored term set differs from the raw query — keep WAND's count.)
        if out.pop("mode", None) == "wand" and self.wand.expander is None:
            out = dict(out)
            out["found"] = self.wand.found_count(q)
        search_ms = (time.time() - t1) * 1000
        out = self._hydrate(out)
        out["search_time_ms"] = round(search_ms, 2)
        with self._lock:
            self.search_cache.put(key, out)
        # deep-enough copy: the cached entry keeps its own row dicts, so a
        # caller (or the ai_overview hook) mutating returned rows cannot
        # corrupt later cache hits (ADVICE r3)
        out = _copy_response(out)
        out["cached"] = False
        out["total_time_ms"] = round((time.time() - t0) * 1000, 2)
        return out

    def suggest(self, q: str, k: int = 5) -> dict:
        with self._lock:
            self._counters["suggests"] += 1
        sugg = self._get_suggester().suggest(q, k)
        return {"query": q, "suggestions": sugg}

    def reload(self) -> dict:
        with self._lock:
            self._counters["reloads"] += 1
            self._load()
        return {"status": "reloaded", "load_seconds": round(self.load_seconds, 3)}

    def ai_overview(self, q: str, k: int = 10) -> dict:
        """AI-overview endpoint logic with LRU caching — reference flow
        (src/api_server.cpp:230-303 + src/api_ai_overview.cpp:140-246):
        cache key "query|k"; on miss, search results feed the external-LLM
        hook; only successful responses are cached (persisted every update).
        The reference's retry-for-cache loop polls engine.search up to
        10×50 ms for a PARALLEL /api/search to fill the result cache — our
        search is synchronous in-process, so one call both checks and fills.
        A ``status`` key (popped by the HTTP layer) carries non-200 codes."""
        kk = clamp_k(k)
        key = f"{q}|{kk}"  # make_cache_key parity (api_engine.cpp:190-192)
        with self._lock:
            cached = self.ai_overview_cache.get(key)
        if cached is not None:
            out = dict(cached)
            out["cached"] = True  # api_ai_overview.cpp:154-156
            return out
        hook = self.hooks.get("ai_overview")
        if hook is None:
            return {"error": "endpoint not configured "
                             "(external AI service hook)", "status": 501}
        sr = self.search(q, kk)
        if not sr.get("results"):
            return {"error": "No search results found for the query",
                    "query": q, "status": 404}  # api_server.cpp:272-279
        ai = hook({"q": q, "k": kk, "results": sr["results"]})
        resp: dict = {"query": q}
        if isinstance(ai, dict) and ai.get("success"):
            resp["overview"] = ai.get("overview")
            resp["model"] = ai.get("model")
            if "usage" in ai:
                resp["usage"] = ai["usage"]
            resp["cached"] = False
            with self._lock:
                self.ai_overview_cache.put(key, resp)
            return dict(resp)
        resp["error"] = (ai or {}).get("error", "Unknown error") \
            if isinstance(ai, dict) else "Unknown error"
        if isinstance(ai, dict) and "details" in ai:
            resp["details"] = ai["details"]
        resp["status"] = 500
        return resp

    def ai_summary(self, cord_uid: str) -> dict:
        """AI-summary endpoint logic with LRU caching — reference flow
        (src/api_server.cpp:305-345 + src/api_ai_summary.cpp:96-226): cache
        key "summary|<uid>"; only successful responses cached."""
        key = f"summary|{cord_uid}"
        with self._lock:
            cached = self.ai_summary_cache.get(key)
        if cached is not None:
            out = dict(cached)
            out["cached"] = True
            return out
        hook = self.hooks.get("ai_summary")
        if hook is None:
            return {"error": "endpoint not configured "
                             "(external AI service hook)", "status": 501}
        ai = hook({"cord_uid": cord_uid})
        resp: dict = {"cord_uid": cord_uid}
        if isinstance(ai, dict) and ai.get("success"):
            resp["summary"] = ai.get("summary")
            resp["model"] = ai.get("model")
            if "usage" in ai:
                resp["usage"] = ai["usage"]
            resp["cached"] = False
            with self._lock:
                self.ai_summary_cache.put(key, resp)
            return dict(resp)
        resp["error"] = (ai or {}).get("error", "Unknown error") \
            if isinstance(ai, dict) else "Unknown error"
        if isinstance(ai, dict) and "details" in ai:
            resp["details"] = ai["details"]
        resp["status"] = 500
        return resp

    def feedback(self, payload: dict) -> dict:
        """Validate + store one feedback entry (reference handle_feedback,
        src/api_feedback.cpp:155-238). Returns the success JSON or
        {'error': ...} with the reference's message strings."""
        entry, err = validate_feedback(payload)
        if err is not None:
            return {"error": err}
        if not self.feedback_store.add(entry):
            return {"error": "Failed to save feedback"}
        return {
            "success": True,
            "message": "Feedback received successfully",
            "total_count": self.feedback_store.count(),
        }

    def stats(self) -> dict:
        with self._lock:
            counters = dict(self._counters)
        total = counters["searches"]
        hits = counters["search_cache_hits"]
        return {
            **counters,
            "cache_entries": len(self.search_cache.data),
            "cache_hits": self.search_cache.hits,
            "cache_misses": self.search_cache.misses,
            # reference derived rate + last-10 feedback slice
            # (include/api_stats.hpp:128-157)
            "search_cache_hit_rate": (hits / total) if total else 0.0,
            "last_10_feedback": self.feedback_store.last(10),
            "total_feedback_count": self.feedback_store.count(),
            "docs": self.wand.N,
        }

    # ------------------------------------------------------------ internal --

    def _get_suggester(self):
        # double-checked under the engine lock: two HTTP threads racing the
        # first /api/suggest would otherwise both build the table (benign
        # but a duplicated multi-second scan on a big suggest table)
        if self._suggester is None:
            with self._lock:
                if self._suggester is None:
                    self._suggester = self._build_suggester()
        return self._suggester

    def _build_suggester(self):
        from nextsearch_api_spark.config import IndexPaths
        from nextsearch_api_spark.operators.autocomplete import LazySuggester

        # Lazy serving (VERDICT r5 next #1): footers scanned once, lookups
        # answered by row-group-pruned pyarrow reads + an LRU of hot prefix
        # buckets — O(#row-groups) driver RAM instead of O(vocab·prefixes).
        # The lexicon df map already in RAM (WandEngine) gives exact
        # long-prefix completion beyond the table's explosion bound.
        return LazySuggester(IndexPaths(self.index_root).suggest,
                             df_lookup=self.wand._df)

    def _hydrate(self, out: dict) -> dict:
        """Join top-k hits with doc metadata (reference hydration,
        api_engine.cpp:508-532 — left-join semantics: missing meta tolerated)."""
        if not out["results"]:
            return out
        import pyarrow.dataset as ds

        from nextsearch_api_spark.config import IndexPaths
        ids = [r["doc_id"] for r in out["results"]]
        meta = ds.dataset(IndexPaths(self.index_root).docs).to_table(
            columns=["doc_id", "uid", "repo", "path", "commit", "lang"],
            filter=ds.field("doc_id").isin(ids),
        ).to_pandas().set_index("doc_id")
        for r in out["results"]:
            if r["doc_id"] in meta.index:
                row = meta.loc[r["doc_id"]]
                r.update(uid=row["uid"], repo=row["repo"], path=row["path"],
                         commit=row["commit"], lang=row["lang"])
        return out


def main() -> None:
    """CLI: python -m nextsearch_api_spark.api <index_root> search "query" [k]"""
    import argparse

    ap = argparse.ArgumentParser(prog="nextsearch-api")
    ap.add_argument("index_root")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("search")
    sp.add_argument("query")
    sp.add_argument("k", nargs="?", type=int, default=10)
    sg = sub.add_parser("suggest")
    sg.add_argument("query")
    sg.add_argument("k", nargs="?", type=int, default=5)
    sub.add_parser("health")
    sub.add_parser("stats")
    args = ap.parse_args()

    eng = Engine(args.index_root)
    if args.cmd == "search":
        print(json.dumps(eng.search(args.query, args.k), indent=2))
    elif args.cmd == "suggest":
        print(json.dumps(eng.suggest(args.query, args.k), indent=2))
    elif args.cmd == "health":
        print(json.dumps(eng.health(), indent=2))
    elif args.cmd == "stats":
        print(json.dumps(eng.stats(), indent=2))


if __name__ == "__main__":
    main()
