"""Atomic index-generation flips.

Compaction (operators/compact.py, streaming/ingest.py) rewrites several
index components (postings, lexicon, forward, docs, stats). r1 swapped them
with sequential os.rename pairs — a crash between renames left postings and
lexicon from different generations (df/N mismatch → wrong idf; ADVICE r1).

Now every compaction writes brand-new ``<component>_g<N>`` directories and
flips the single ``CURRENT.json`` pointer with one atomic ``os.replace``.
Readers (IndexPaths._resolve) either see the old generation or the new one,
never a mix. Superseded generation dirs are garbage-collected best-effort
after the flip.

Note: single-file atomic replace is a local/NFS/HDFS-rename property; on
object stores the same pointer flip works because it is one small PUT.
"""

from __future__ import annotations

import json
import os
import shutil

from nextsearch_api_spark.config import CURRENT_POINTER

DEFAULT_COMPONENTS = {
    "docs": "docs",
    "postings": "postings",
    "lexicon": "lexicon",
    "suggest": "suggest",
    "forward": "forward",
    "stats": "stats.json",
}


def current_mapping(index_root: str) -> dict:
    """The live component→dirname mapping (defaults when no pointer)."""
    mapping = dict(DEFAULT_COMPONENTS)
    mapping["gen"] = 0
    try:
        with open(os.path.join(index_root, CURRENT_POINTER)) as f:
            mapping.update(json.load(f))
    except Exception:
        pass
    return mapping


def next_gen(index_root: str) -> int:
    return int(current_mapping(index_root).get("gen", 0)) + 1


def gen_path(index_root: str, component: str, gen: int) -> str:
    """Physical path for a component of generation ``gen`` (not yet live)."""
    suffix = f"_g{gen}"
    base = DEFAULT_COMPONENTS[component]
    if base.endswith(".json"):
        return os.path.join(index_root, base[:-5] + suffix + ".json")
    return os.path.join(index_root, base + suffix)


def flip_generation(index_root: str, components: dict[str, str],
                    gen: int) -> dict:
    """Point CURRENT.json at new component dirs in ONE atomic replace.

    ``components`` maps component name → dirname (relative to index_root);
    unnamed components keep their previous mapping. Old dirs that are no
    longer referenced are removed best-effort AFTER the flip."""
    unknown = set(components) - set(DEFAULT_COMPONENTS)
    if unknown:
        raise ValueError(f"unknown index components: {sorted(unknown)}")
    old = current_mapping(index_root)
    new = dict(old)
    new.update(components)
    new["gen"] = gen

    cur = os.path.join(index_root, CURRENT_POINTER)
    tmp = cur + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new, f, indent=2)
    os.replace(tmp, cur)  # ← the one atomic commit point

    # GC superseded physical dirs (safe: nothing references them anymore)
    for name in components:
        prev = old.get(name, DEFAULT_COMPONENTS[name])
        if prev != new[name]:
            stale = os.path.join(index_root, prev)
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
            elif os.path.exists(stale):
                try:
                    os.remove(stale)
                except OSError:
                    pass
    return new
