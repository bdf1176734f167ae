"""Chunk compaction: fragmented-term merge must preserve the logical index
and search results exactly."""

import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.config import BuildConfig, IndexPaths
from nextsearch_api_spark.operators.build import build_index
from nextsearch_api_spark.operators.compact import compact_postings
from nextsearch_api_spark.operators.wand import WandEngine
from nextsearch_api_spark.sources.corpus import generate_corpus, read_corpus, write_corpus


def test_compact_preserves_search(spark, tmp_path):
    p = str(tmp_path / "c")
    write_corpus(generate_corpus(spark, 400, seed=42), p, partition_by=None)
    corpus = read_corpus(spark, p)
    root = str(tmp_path / "idx")
    # many explicit segments over a tiny corpus → fragmented chunks (the
    # condition compaction exists for)
    build_index(spark, corpus, root, BuildConfig(segment_partitions=12))

    before = spark.read.parquet(IndexPaths(root).postings).count()
    df_sum_before = spark.read.parquet(IndexPaths(root).lexicon).agg(
        F.sum("df")).collect()[0][0]
    w1 = WandEngine(root)
    queries = ["hotterm", "buffer", "load config", "cache99 flush hotterm score"]
    res_before = [w1.search(q, 10) for q in queries]

    out = compact_postings(spark, root)
    assert out["swapped"] and out["fragmented_terms"] > 0
    after = spark.read.parquet(IndexPaths(root).postings).count()
    assert after < before  # fewer, fuller chunks

    # lexicon df mass preserved
    lex = spark.read.parquet(IndexPaths(root).lexicon)
    assert lex.agg(F.sum("df")).collect()[0][0] == df_sum_before

    w2 = WandEngine(root)
    for q, r1 in zip(queries, res_before):
        r2 = w2.search(q, 10)
        assert [x["doc_id"] for x in r2["results"]] == [
            x["doc_id"] for x in r1["results"]
        ], q
        assert r2["found"] == r1["found"]


def test_generation_gc_deferred_one_flip(spark, tmp_path):
    """flip_generation defers GC by one generation (ADVICE r2): a reader
    opened before a compaction keeps serving from the superseded dirs until
    the NEXT flip, instead of hitting FileNotFoundError mid-query."""
    import os

    from nextsearch_api_spark.plans.generations import current_mapping

    p = str(tmp_path / "c")
    write_corpus(generate_corpus(spark, 300, seed=42), p, partition_by=None)
    corpus = read_corpus(spark, p)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, BuildConfig(segment_partitions=8))

    old = WandEngine(root)  # long-lived reader (e.g. the HTTP server)
    before = old.search("hotterm buffer", 10)

    out1 = compact_postings(spark, root)
    assert out1["swapped"]
    m1 = current_mapping(root)
    assert m1["gc_pending"]  # superseded dirs recorded, NOT deleted
    for d in m1["gc_pending"]:
        assert os.path.exists(os.path.join(root, d)), d
    # prune-on/off parity survives compaction (same avgdl → impact_avgdl
    # marker still valid → prefilter active on the rebuilt chunks)
    from nextsearch_api_spark.operators.query import (
        IndexReader, QuerySpec, batch_search,
    )
    rd = IndexReader(spark, root)
    pa_ = batch_search(rd, [QuerySpec(0, "hotterm", 5)], prune_chunks=True)
    pb_ = batch_search(rd, [QuerySpec(0, "hotterm", 5)], prune_chunks=False)
    assert ([(r["doc_id"], round(r["score"], 9), r["found"])
             for r in pa_.orderBy("rank").collect()]
            == [(r["doc_id"], round(r["score"], 9), r["found"])
                for r in pb_.orderBy("rank").collect()])

    # the pre-flip reader still serves identical results from the old dirs
    again = old.search("hotterm buffer", 10)
    assert [x["doc_id"] for x in again["results"]] == [
        x["doc_id"] for x in before["results"]]

    # the NEXT flip (here a no-op component flip, as any later compaction
    # would be) garbage-collects the dirs superseded one generation ago
    from nextsearch_api_spark.plans.generations import flip_generation
    m2 = flip_generation(root, {}, m1["gen"] + 1)
    for d in m1["gc_pending"]:
        assert not os.path.exists(os.path.join(root, d)), d
    assert m2["gc_pending"] == []
    assert m2["atomic_rename"] == "local"
    # fresh reader on the new generation agrees
    w = WandEngine(root)
    now = w.search("hotterm buffer", 10)
    assert [x["doc_id"] for x in now["results"]] == [
        x["doc_id"] for x in before["results"]]
    assert m2["gen"] == m1["gen"] + 1


def test_index_format_version_checked(spark, tmp_path, tiny_index):
    """Readers refuse an index whose stats.json carries a different on-disk
    format version (VERDICT r2 #7) instead of relying on the overlap
    fail-fast."""
    import json
    import os
    import shutil

    root, _ = tiny_index
    clone = str(tmp_path / "stale_idx")
    shutil.copytree(root, clone)
    stats_path = IndexPaths(clone).stats
    with open(stats_path) as f:
        stats = json.load(f)
    assert "format" in stats  # builds stamp the version
    stats["format"] = stats["format"] - 1
    with open(stats_path, "w") as f:
        json.dump(stats, f)
    import pytest as _pytest

    from nextsearch_api_spark.operators.query import IndexReader
    with _pytest.raises(ValueError, match="format"):
        WandEngine(clone)
    with _pytest.raises(ValueError, match="format"):
        IndexReader(spark, clone)


def test_generation_gc_failed_delete_retried(tmp_path, monkeypatch):
    """A gc_pending dir whose deletion FAILS stays tracked for retry at the
    next flip instead of leaking untracked (ADVICE r3)."""
    import json
    import os

    from nextsearch_api_spark.config import CURRENT_POINTER
    from nextsearch_api_spark.plans import generations
    from nextsearch_api_spark.plans.generations import flip_generation

    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, "postings_g1"))
    os.makedirs(os.path.join(root, "stale_old"))
    with open(os.path.join(root, CURRENT_POINTER), "w") as f:
        json.dump({"gen": 1, "postings": "postings_g1",
                   "gc_pending": ["stale_old"]}, f)

    # simulate an undeletable dir (open handles on a non-POSIX mount, perms)
    monkeypatch.setattr(generations.shutil, "rmtree",
                        lambda *a, **kw: None)
    m2 = flip_generation(root, {}, 2)
    assert "stale_old" in m2["gc_pending"]      # kept for retry
    # the pointer on disk agrees with the returned mapping
    with open(os.path.join(root, CURRENT_POINTER)) as f:
        assert "stale_old" in json.load(f)["gc_pending"]

    # once deletion works again, the NEXT flip clears it
    monkeypatch.undo()
    m3 = flip_generation(root, {}, 3)
    assert not os.path.exists(os.path.join(root, "stale_old"))
    assert "stale_old" not in m3["gc_pending"]


def test_backup_restore_roundtrip(spark, tmp_path):
    """Backup = consistent snapshot of the LIVE generation (resolved through
    CURRENT.json once); restore = servable index under base names with no
    pointer — reference scripts/backup_data.cpp analog on the generations
    layer. Restored index answers queries identically to the source."""
    import os

    from nextsearch_api_spark.operators.build import build_index
    from nextsearch_api_spark.operators.query import (
        IndexReader, QuerySpec, batch_search,
    )
    from nextsearch_api_spark.plans.backup import backup_index, restore_index
    from nextsearch_api_spark.sources.corpus import generate_corpus

    root = str(tmp_path / "idx")
    build_index(spark, generate_corpus(spark, 120, seed=42), root)

    bdir = str(tmp_path / "bak")
    man = backup_index(root, bdir)
    assert {"docs", "postings", "lexicon", "stats"} <= set(man["components"])
    assert man["source_gen"] == 0
    assert os.path.exists(os.path.join(bdir, "_backup.json"))

    tgt = str(tmp_path / "restored")
    restore_index(bdir, tgt)
    assert not os.path.exists(os.path.join(tgt, "CURRENT.json"))

    specs = [QuerySpec(0, "buffer hotterm", 5), QuerySpec(1, "cache99", 3)]
    key = lambda r: (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9),
                     r["found"])
    a = sorted(key(r) for r in
               batch_search(IndexReader(spark, root), specs).collect())
    b = sorted(key(r) for r in
               batch_search(IndexReader(spark, tgt), specs).collect())
    assert a == b and a

    # refuse restoring over a non-empty target
    import pytest
    with pytest.raises(ValueError, match="not empty"):
        restore_index(bdir, root)
    with pytest.raises(ValueError, match="unknown components"):
        backup_index(root, str(tmp_path / "bak2"), components=["nope"])

    # after a compaction FLIP the backup resolves the live _gN dirs through
    # CURRENT.json (consistent cut) and the restore serves identically from
    # base names with no pointer
    out = compact_postings(spark, root)
    assert out["swapped"]
    b2 = str(tmp_path / "bak_g1")
    man2 = backup_index(root, b2)
    assert man2["source_gen"] == 1
    t2 = str(tmp_path / "restored_g1")
    restore_index(b2, t2)
    assert not os.path.exists(os.path.join(t2, "CURRENT.json"))
    c = sorted(key(r) for r in
               batch_search(IndexReader(spark, t2), specs).collect())
    assert c == a


def test_backup_consistent_cut_under_concurrent_flip(tmp_path, monkeypatch):
    """A generation flip that lands BETWEEN component copies must not mix
    generations in the snapshot (ADVICE r5 high): every component resolves
    from the one current_mapping() taken at backup start, so the backup is
    all-gen-1 even though CURRENT.json flips to gen 2 mid-copy."""
    import json
    import os

    from nextsearch_api_spark.plans import backup as backup_mod
    from nextsearch_api_spark.plans.backup import backup_index
    from nextsearch_api_spark.plans.generations import DEFAULT_COMPONENTS

    root = str(tmp_path / "idx")
    os.makedirs(root)
    # materialize gen-1 and gen-2 physical layouts with distinguishable
    # marker files (plus base-name gen-0 dirs: GC is deferred, they linger)
    for gen in (0, 1, 2):
        sfx = f"_g{gen}" if gen else ""
        for name, base in DEFAULT_COMPONENTS.items():
            if base.endswith(".json"):
                p = os.path.join(root, base[:-5] + sfx + ".json")
                with open(p, "w") as f:
                    json.dump({"gen": gen}, f)
            else:
                d = os.path.join(root, base + sfx)
                os.makedirs(d)
                with open(os.path.join(d, "MARKER"), "w") as f:
                    f.write(str(gen))

    def point_at(gen):
        m = {n: (b[:-5] + f"_g{gen}.json" if b.endswith(".json")
                 else b + f"_g{gen}")
             for n, b in DEFAULT_COMPONENTS.items()}
        m["gen"] = gen
        with open(os.path.join(root, "CURRENT.json"), "w") as f:
            json.dump(m, f)

    point_at(1)

    # flip the live pointer to gen 2 as soon as the FIRST component copies
    real_copytree = backup_mod.shutil.copytree
    real_copy2 = backup_mod.shutil.copy2
    flipped = {"done": False}

    def flip_once():
        if not flipped["done"]:
            flipped["done"] = True
            point_at(2)

    def copytree(src, dst, **kw):
        out = real_copytree(src, dst, **kw)
        flip_once()
        return out

    def copy2(src, dst, **kw):
        out = real_copy2(src, dst, **kw)
        flip_once()
        return out

    monkeypatch.setattr(backup_mod.shutil, "copytree", copytree)
    monkeypatch.setattr(backup_mod.shutil, "copy2", copy2)

    bdir = str(tmp_path / "bak")
    man = backup_index(root, bdir)
    assert flipped["done"] and man["source_gen"] == 1

    # every snapshotted component carries the gen-1 marker — no mixing
    for name, rel in man["components"].items():
        dst = os.path.join(bdir, rel)
        if os.path.isdir(dst):
            with open(os.path.join(dst, "MARKER")) as f:
                assert f.read() == "1", f"{name} came from the wrong generation"
        else:
            with open(dst) as f:
                assert json.load(f)["gen"] == 1, name
