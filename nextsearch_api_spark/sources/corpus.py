"""Synthetic source-code corpus: deterministic, distributed generation.

Input contract (BASELINE.json input_hint): an Iceberg table of source-code
repositories with columns (repo, path, commit, lang, content). No Iceberg jars
ship in this sandbox, so :func:`read_corpus` / :func:`write_corpus` speak
Iceberg when ``spark.read.format("iceberg")`` resolves and fall back to an
identically-schema'd Parquet directory otherwise — everything downstream is
format-agnostic DataFrames.

Generation (FIXTURES.md §1): content is ASCII-only code-like text whose tokens
are drawn Zipfian (s≈1.1) from a fixed identifier vocabulary, seasoned with
the reference's stopwords, 1-char tokens, digit-embedded and CamelCase tokens,
one super-hot term (``hotterm``, ≥90% of docs) for skew testing, duplicate
contents for tie-break testing, and punctuation-only zero-token docs
(reference drops them — src/ForwardIndex.cpp:152).

Every doc's content is a pure function of (seed, doc index) — generation is
embarrassingly parallel via mapInPandas over ``spark.range``, so the same
corpus comes out at any parallelism / partition layout. This mirrors the
reference's own seeded corpus sampler (scripts/slice_cord19.cpp:194-247) but
distributed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

LANGS = ["py", "java", "cpp", "js", "go", "rs"]
_EXT = {"py": "py", "java": "java", "cpp": "cpp", "js": "js", "go": "go", "rs": "rs"}

VOCAB_SIZE = 5000
HOT_TERM = "hotterm"

_SEPS = np.array([" ", "\n", " (", ") ", ". ", " = ", "; ", ", ", " { ", " } ", ": "])

# Tokens that exercise specific reference semantics: stopwords (dropped),
# 1-char tokens (len<2, dropped), digit-embedded + CamelCase (lowercased,
# kept), all mixed into the Zipf pool at assorted ranks.
_SPICE = [
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "from",
    "x", "y", "i", "j", "k", "_",
    "sha256sum", "v2", "idx0", "utf8", "x86", "LoadConfig", "HttpServer2",
]


def _vocab() -> np.ndarray:
    """Fixed 5k identifier-like vocabulary (ASCII; underscores are token
    delimiters per the reference tokenizer, which is intended — `load_config`
    tokenizes to `load`,`config` just as the reference would)."""
    stems = [
        "load", "config", "buffer", "parse", "index", "query", "merge", "flush",
        "cache", "token", "stream", "write", "read", "block", "chunk", "hash",
        "score", "rank", "doc", "term", "post", "list", "heap", "node", "tree",
        "path", "repo", "commit", "file", "line", "char", "byte", "word", "text",
        "data", "util", "core", "impl", "spec", "test", "mock", "init", "free",
        "alloc", "copy", "move", "swap", "sort", "scan", "seek", "sync", "lock",
    ]
    out: list[str] = []
    for i in range(VOCAB_SIZE):
        s1 = stems[i % len(stems)]
        s2 = stems[(i * 7 + 3) % len(stems)]
        r = i % 5
        if r == 0:
            out.append(f"{s1}{i % 97}")
        elif r == 1:
            out.append(f"{s1}_{s2}")
        elif r == 2:
            out.append(f"{s1}{s2.capitalize()}")
        elif r == 3:
            out.append(s1 + "er")
        else:
            out.append(f"{s1}{s2}{i % 13}")
    # splice in the spice tokens at deterministic ranks
    for j, t in enumerate(_SPICE):
        out[(j * 131 + 17) % VOCAB_SIZE] = t
    return np.array(out)


_VOCAB = _vocab()
# Zipf(s=1.1) inverse-CDF table over vocabulary ranks.
_ZIPF_P = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** 1.1
_ZIPF_CUM = np.cumsum(_ZIPF_P / _ZIPF_P.sum())

_DUP_CONTENT = (
    "loadConfig buffer_merge the cache99 flush_token hotterm "
    "score rank43 heapSort heapSort parse_index"
)


def _doc_content(i: int, seed: int) -> str:
    if i % 4999 == 7:        # zero-token doc: punctuation only
        return "!!! ??? ... ;;; ((( ))) %%% &&& ***"
    if i % 997 in (0, 1):     # duplicate content across distinct docs
        return _DUP_CONTENT
    rng = np.random.default_rng((seed << 20) ^ i)
    n = int(rng.integers(50, 800))
    toks = _VOCAB[np.searchsorted(_ZIPF_CUM, rng.random(n))]
    if rng.random() < 0.92:   # super-hot skew term in ≥90% of docs
        pos = rng.integers(0, n, size=int(rng.integers(1, 4)))
        toks = toks.copy()
        toks[pos] = HOT_TERM
    seps = _SEPS[rng.integers(0, len(_SEPS), n)]
    parts = np.empty(2 * n, dtype=object)
    parts[0::2] = toks
    parts[1::2] = seps
    return "".join(parts.tolist())


def generate_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                    partitions: int | None = None) -> DataFrame:
    """Deterministic corpus of ``n_docs`` rows, generated in parallel."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            repos, paths, commits, langs, contents = [], [], [], [], []
            for i in ids:
                i = int(i)
                lang = LANGS[i % len(LANGS)]
                repo = f"org{i % 7}/repo{i % 23}"
                path = f"src/dir{i % 11}/file_{i}.{_EXT[lang]}"
                commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:12]
                repos.append(repo)
                paths.append(path)
                commits.append(commit)
                langs.append(lang)
                contents.append(_doc_content(i, seed))
            yield pd.DataFrame(
                {"repo": repos, "path": paths, "commit": commits,
                 "lang": langs, "content": contents}
            )

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


_CORPUS_FORMATS = ("parquet", "orc", "json", "csv")


def write_corpus(df: DataFrame, target: str, partition_by: str | None = "lang",
                 fmt: str = "parquet") -> None:
    """Write the corpus table — Iceberg when available, else a file-format
    directory with an identical schema (SURVEY.md §7.0 CorpusCatalog
    contract). ``fmt``: parquet (default) | orc | json | csv — parquet/orc
    are the columnar scale paths (column pruning + predicate pushdown);
    json/csv cover interchange with external pipelines."""
    if fmt not in _CORPUS_FORMATS:
        raise ValueError(f"fmt must be one of {_CORPUS_FORMATS}")
    # canonical column order on disk: the explicit-schema readers (csv/orc)
    # apply positionally, so a caller-side column permutation must not leak
    # into the files (ADVICE r4 #4 — silently swapped columns on round-trip)
    df = df.select("repo", "path", "commit", "lang", "content")
    spark = df.sparkSession
    if _iceberg_available(spark) and "/" not in target:
        w = df.writeTo(target)
        w.createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    if fmt == "csv":
        # content carries newlines/commas/quotes — full quoting + escape,
        # and the writer's whitespace trimming OFF (it defaults to true and
        # silently drops trailing newlines/spaces from quoted values)
        w = (w.option("header", "true").option("escape", '"')
             .option("multiLine", "true")
             .option("ignoreLeadingWhiteSpace", "false")
             .option("ignoreTrailingWhiteSpace", "false"))
    w.format(fmt).save(target)


def read_corpus(spark: SparkSession, source: str,
                fmt: str = "parquet") -> DataFrame:
    """Read the corpus from an Iceberg table name or a file-format path.
    Non-parquet formats are read with the EXPLICIT corpus schema — never
    inferred (csv/json inference costs an extra pass and can drift types)."""
    if fmt not in _CORPUS_FORMATS:
        raise ValueError(f"fmt must be one of {_CORPUS_FORMATS}")
    if "/" not in source and _iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    schema = "repo string, path string, commit string, lang string, content string"
    if fmt == "parquet":
        return spark.read.parquet(source)
    if fmt == "orc":
        return spark.read.orc(source).select(
            "repo", "path", "commit", "lang", "content")
    r = spark.read.schema(schema)
    if fmt == "csv":
        # multiLine + quote-escape for newline/comma-bearing content, and
        # the univocity whitespace trimming OFF — content bytes must
        # round-trip exactly. enforceSchema=false validates the header NAMES
        # against the schema instead of dropping the header positionally, so
        # a column-permuted file fails fast instead of silently swapping
        # (ADVICE r4 #4; write_corpus also canonicalizes order on write).
        r = (r.option("header", "true").option("escape", '"')
             .option("multiLine", "true")
             .option("enforceSchema", "false")
             .option("ignoreLeadingWhiteSpace", "false")
             .option("ignoreTrailingWhiteSpace", "false"))
    return r.format(fmt).load(source).select(
        "repo", "path", "commit", "lang", "content")
