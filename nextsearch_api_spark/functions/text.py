"""Tokenization & normalization — reference-parity text functions.

Reference semantics (include/textutil.hpp:13-37):
  * tokenize: keep maximal runs of ``isalnum`` chars, lowercased; everything
    else is a delimiter (ASCII / C locale).
  * keep only tokens with len >= 2 (src/ForwardIndex.cpp:147) that are not one
    of the 25 fixed English stopwords (textutil.hpp:31-37).

The corpus contract (FIXTURES.md) is ASCII-only content, where Spark's Unicode
``lower()`` + ``[^a-z0-9]+`` split agrees exactly with the reference's
ASCII ``std::tolower`` + ``std::isalnum`` — see SURVEY.md §7.3 for the
documented non-ASCII divergence.

Two implementations, same results:
  * ``tokens_expr`` — pure Catalyst expressions (split / filter / lower), runs
    inside whole-stage codegen, no Python in the hot path.
  * ``tokenize_series`` — vectorized pandas (Arrow-batched), used by the
    build pipeline's mapInArrow tokenizer where we also need per-doc tf maps.
"""

from __future__ import annotations

import re
from typing import Iterable, List

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's exact stoplist, verbatim (include/textutil.hpp:31-37) — 24 words.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "for", "on", "with",
    "by", "as", "is", "are", "was", "were", "be", "been", "it", "this",
    "that", "from", "at",
)
STOPWORD_SET = frozenset(STOPWORDS)

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokens_expr(col: Column | str) -> Column:
    """All tokens of ``col`` (lowercased [a-z0-9]+ runs), before length /
    stopword filtering. JVM-side; stays inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"[^a-z0-9]+")
    return F.filter(toks, lambda x: x != F.lit(""))


def kept_tokens_expr(col: Column | str, min_len: int = 2) -> Column:
    """Tokens surviving the reference's len>=2 + stopword filter
    (ForwardIndex.cpp:147, api_engine.cpp:391-397)."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        tokens_expr(col),
        lambda x: (F.length(x) >= F.lit(min_len)) & ~F.array_contains(sw, x),
    )


def kept_tokens_sql(col: str, min_len: int = 2) -> str:
    """Same as :func:`kept_tokens_expr` as a SQL snippet (for spark.sql /
    DuckDB oracle parity — both engines support lambda filters)."""
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"filter(split(lower({col}), '[^a-z0-9]+'), "
        f"x -> x != '' AND length(x) >= {min_len} AND NOT array_contains(array({sw}), x))"
    )


def tokenize_py(text: str) -> List[str]:
    """Reference tokenizer, plain Python (oracle + tests).
    Exactly: lowercase, [a-z0-9]+ runs (textutil.hpp:13-28)."""
    return _TOKEN_RE.findall(text.lower())


def kept_tokens_py(text: str, min_len: int = 2) -> List[str]:
    return [
        t for t in tokenize_py(text)
        if len(t) >= min_len and t not in STOPWORD_SET
    ]


def tokenize_series(texts: "pd.Series") -> "pd.Series":  # noqa: F821
    """Vectorized tokenizer: pd.Series[str] -> pd.Series[list[str]] of KEPT
    tokens (len>=2, non-stopword). Arrow-batched — no per-row Python loops in
    the regex/lower path (pandas .str ops are C-backed)."""
    import pandas as pd  # local import keeps module importable without pandas

    toks = texts.fillna("").str.lower().str.findall(r"[a-z0-9]+")
    sw = STOPWORD_SET
    # the per-list filter is cheap relative to the C-backed findall
    return pd.Series(
        [[t for t in lst if len(t) >= 2 and t not in sw] for lst in toks],
        index=texts.index,
    )


def normalize_token_expr(col: Column | str) -> Column:
    """Autocomplete normalization: strip non-alnum, lowercase — no splitting
    (reference: AutocompleteIndex::normalize_token, api_autocomplete.cpp:23-30)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[^a-z0-9]", "")


def first_of_semicolon_expr(col: Column | str) -> Column:
    """First element of a ';'-separated list, trimmed (reference:
    pick_first_path src/ForwardIndex.cpp:44-52; url split api_engine.cpp:525-527)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.split(c, ";").getItem(0))


def doc_len_expr(col: Column | str) -> Column:
    """doc_len = number of kept tokens (reference: ForwardIndex.cpp:141-151)."""
    return F.size(kept_tokens_expr(col))


def stopwords_sql_list() -> str:
    return ", ".join(f"'{s}'" for s in STOPWORDS)


def sw_tuple() -> Iterable[str]:
    return STOPWORDS
