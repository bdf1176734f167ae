"""Exact phrase matching over the corpus — a fulltext capability beyond
the reference's bag-of-words tiers (its query path OR-accumulates single
terms, ``src/api_engine.cpp:437-504``; no phrase semantics exist there).

Spark-first shape: phrase matching is a SCAN operator, not an index-format
change. Two stages, both whole-stage-codegen JVM expressions (no Python in
the hot path):

1. a coarse conjunctive prefilter — every distinct phrase token must be a
   substring of lower(text). Plain ``Contains`` predicates: parquet can't
   serve substring predicates from min/max stats (only prefix ones), so
   they don't appear in PushedFilters, but Catalyst fuses them ahead of
   the exact check in ONE codegen Filter whose AND short-circuits — rows
   failing the cheap Contains never pay the tokenize. Sources that do
   support contains-pushdown get it for free from the same plan.
2. the exact check — tokenize (lower, [^a-z0-9]+ split) and count sliding-
   window positions where the next m tokens equal the phrase. OVERLAPPING
   occurrences count ("table table table" contains "table table" twice),
   the convention both the operator and its SQL oracle implement.

Phrase tokens deliberately use the RAW tokenizer (no stopword/min-length
filtering): "the big join" must match those three words verbatim — index
normalization would silently turn the phrase into a different query.

At 100 TB: stage 1 is free at the scan, stage 2 is linear in the surviving
rows' token counts, and top-k ranking plans as TakeOrderedAndProject — no
shuffle anywhere except the final k-row merge.
"""

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["phrase_tokens", "phrase_match", "phrase_topk"]


def phrase_tokens(phrase: str) -> list:
    """Raw tokenization of the phrase: lowercase, [^a-z0-9]+ split.
    Tokens are [a-z0-9]+ by construction (safe to inline in expr SQL)."""
    toks = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not toks:
        raise ValueError("phrase must contain at least one token")
    return toks


def _occurrences_expr(toks: list, arr: str = "_toks") -> str:
    """Codegen expression counting sliding-window matches of ``toks`` in
    the token-array column ``arr`` (element_at is 1-based). Guarded:
    Spark's sequence(1, n) DESCENDS for n < 1 instead of yielding empty."""
    m = len(toks)
    cond = " AND ".join(
        f"element_at({arr}, i + {j}) = '{t}'" for j, t in enumerate(toks))
    return (f"CASE WHEN size({arr}) >= {m} THEN "
            f"size(filter(sequence(1, size({arr}) - {m} + 1), "
            f"i -> {cond})) ELSE 0 END")


def phrase_match(docs: DataFrame, phrase: str, id_col: str = "doc_id",
                 text_col: str = "text",
                 keep_zero: bool = False) -> DataFrame:
    """→ (id, n_occurrences) for documents containing the exact phrase
    (all occurrences counted, overlapping included). ``keep_zero=True``
    returns every document with its count instead of filtering."""
    toks = phrase_tokens(phrase)
    out = docs
    if not keep_zero:
        # coarse prefilter: pushable Contains conjunction (superset of the
        # exact matches — substring, so 'table' also passes 'tables')
        low = F.lower(F.col(text_col))
        for t in sorted(set(toks)):
            out = out.where(low.contains(t))
    out = (
        out.withColumn(
            "_toks",
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                     lambda x: x != F.lit("")))
        .withColumn("n_occurrences",
                    F.expr(_occurrences_expr(toks)).cast("long"))
        .select(F.col(id_col), "n_occurrences")
    )
    return out if keep_zero else out.where(F.col("n_occurrences") > 0)


def phrase_topk(docs: DataFrame, phrase: str, k: int = 10,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents by phrase-occurrence count (ties → ascending id).
    sort+limit plans as TakeOrderedAndProject — distributed partial top-k,
    k-row driver merge."""
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    ranked = (phrase_match(docs, phrase, id_col=id_col, text_col=text_col)
              .orderBy(F.desc("n_occurrences"), F.asc(id_col))
              .limit(int(k)))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc(id_col))
    return (ranked.withColumn("rank", F.row_number().over(w))
            .select("rank", id_col, "n_occurrences"))
