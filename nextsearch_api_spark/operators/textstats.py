"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-doc signal layer of a training-data
pipeline. All JVM expressions (whole-stage codegen), no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nextsearch_api_spark.functions.text import STOPWORDS, kept_tokens_expr, tokens_expr

_SW_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (public approach: stopword-hit-rate profiles)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "it", "with"),
    "es": ("de", "la", "que", "el", "en", "los", "del", "las", "por", "un"),
    "fr": ("le", "de", "la", "et", "les", "des", "en", "du", "une", "que"),
    "de": ("der", "die", "und", "das", "von", "mit", "den", "ein", "im", "zu"),
}


def quality_signals(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: token counts, stopword share, punct density."""
    all_toks = tokens_expr(text_col)
    kept = kept_tokens_expr(text_col)
    sw_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.filter(all_toks, lambda x: F.array_contains(sw_arr, x)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")))
        .cast("long").alias("ws_tokens"),
        F.size(all_toks).cast("long").alias("alnum_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        stop_cnt.cast("long").alias("stopword_tokens"),
        F.length(F.regexp_replace(text_col, r"[a-zA-Z0-9\s]", "")).cast("long")
        .alias("punct_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Composite 0-1 quality score (length, punct ratio, stopword balance) —
    the filter stage of a data-curation pipeline."""
    sig = quality_signals(df, text_col, id_col)
    length_ok = F.least(F.col("alnum_tokens") / 100.0, F.lit(1.0))
    punct_ratio = F.col("punct_chars") / F.greatest(F.col("alnum_tokens"), F.lit(1))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio)
    stop_ratio = F.col("stopword_tokens") / F.greatest(F.col("alnum_tokens"), F.lit(1))
    # natural prose has SOME stopwords; code/noise has ~none or all
    stop_ok = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.3)) / F.lit(0.7)
    return sig.select(
        "doc_id",
        F.round((length_ok * 0.4 + punct_ok * 0.3 + stop_ok * 0.3), 6)
        .alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts
    (deterministic; 'und' when nothing matches)."""
    toks = tokens_expr(text_col)

    def contains(arr):
        return lambda x: F.array_contains(arr, x)

    scores = []
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, contains(arr))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("lang_pred"),
        best["hits"].cast("long").alias("lang_hits"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish sub-token estimate
    (letter runs / digit runs / single punct marks)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")))
        .cast("long").alias("ws_tokens"),
        F.size(F.expr(
            f"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"
        )).cast("long").alias("bpe_ish_tokens"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       top_ns: "tuple[int, ...]" = (2, 3, 4)) -> DataFrame:
    """Gopher-style intra-document repetition metrics (Rae et al. 2021
    §A1.1, the standard quality filter for machine-generated/boilerplate
    text) → one row per doc:

      lines_total        non-empty lines
      dup_line_frac      (lines_total - distinct lines) / lines_total
      dup_line_char_frac chars in lines occurring >1 time / chars in lines
      top{n}gram_char_frac  for n in ``top_ns``: chars covered by the most
                         frequent word n-gram (token chars × occurrences)
                         / total token chars, capped at 1.0 — overlapping
                         occurrences ('spam spam spam…') would double-count
                         shared chars, and exact positional coverage isn't
                         worth a non-relational pass for a filter threshold;
                         ties break to the lexicographically smallest n-gram

    Scale shape: all metrics are relational — ONE explode+groupBy keyed
    (doc_id, line) for the line metrics and ONE keyed (doc_id, n, gram)
    covering every n (the n-grams for all ``top_ns`` are concatenated
    before the single explode), then per-doc aggregation. No O(doc²)
    expression work, no Python; skew is bounded by document size."""
    from nextsearch_api_spark.operators.curation import _gram_expr

    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ids = docs.select("doc_id")

    lines = docs.select(
        "doc_id",
        F.explode(F.expr(
            f"filter(split({text_col}, '\\n'), x -> x != '')")).alias("line"),
    )
    line_counts = lines.groupBy("doc_id", "line").agg(
        F.count("*").alias("c"))
    line_m = line_counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("lines_total"),
        F.count("*").cast("long").alias("lines_distinct"),
        F.sum(F.length("line") * F.col("c")).cast("long").alias("line_chars"),
        F.sum(F.when(F.col("c") > 1, F.length("line") * F.col("c"))
              .otherwise(F.lit(0))).cast("long").alias("dup_line_chars"),
    )

    gram_arrays = [
        F.expr(
            "transform({g}, g -> struct({n} AS n, g AS gram))".format(
                g=f"__grams_{n}", n=n)
        )
        for n in top_ns
    ]
    with_grams = docs.select(
        "doc_id",
        F.expr(
            "aggregate(filter(split(lower({t}), '[^a-z0-9]+'), x -> x != ''),"
            " cast(0 as bigint), (acc, x) -> acc + length(x))".format(
                t=text_col)).alias("token_chars"),
        *[_gram_expr(text_col, n).alias(f"__grams_{n}") for n in top_ns],
    )
    token_chars = with_grams.select("doc_id", "token_chars")
    grams = with_grams.select(
        "doc_id", F.explode(F.concat(*gram_arrays)).alias("s")
    ).select("doc_id", F.col("s.n").alias("n"), F.col("s.gram").alias("gram"))
    gram_counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("c"))
    # most-frequent n-gram with deterministic tie-break: min of
    # (-count, gram) = max count, then lexicographically smallest gram
    top = (
        gram_counts.groupBy("doc_id", "n")
        .agg(F.min(F.struct((-F.col("c")).alias("negc"),
                            F.col("gram"))).alias("t"))
        .select(
            "doc_id", "n",
            (-F.col("t.negc")).alias("c"),
            # covered chars: the n-gram's token chars (spaces excluded)
            # times its occurrence count
            (F.length(F.regexp_replace(F.col("t.gram"), " ", ""))
             * -F.col("t.negc")).cast("long").alias("covered"),
        )
    )
    top_cols = top.groupBy("doc_id").pivot("n", list(top_ns)).agg(
        F.first("covered"))

    out = (
        ids.join(line_m, "doc_id", "left")
        .join(token_chars, "doc_id", "left")
        .join(top_cols, "doc_id", "left")
    )
    lt = F.coalesce("lines_total", F.lit(0))
    lc = F.coalesce("line_chars", F.lit(0))
    sel = [
        F.col("doc_id"),
        lt.alias("lines_total"),
        F.round(F.when(lt > 0, (lt - F.coalesce("lines_distinct", F.lit(0)))
                       / lt).otherwise(F.lit(0.0)), 6).alias("dup_line_frac"),
        F.round(F.when(lc > 0, F.coalesce("dup_line_chars", F.lit(0)) / lc)
                .otherwise(F.lit(0.0)), 6).alias("dup_line_char_frac"),
    ]
    tc = F.coalesce("token_chars", F.lit(0))
    for n in top_ns:
        sel.append(
            F.round(F.least(
                F.lit(1.0),
                F.when(tc > 0, F.coalesce(F.col(str(n)), F.lit(0)) / tc)
                .otherwise(F.lit(0.0))), 6)
            .alias(f"top{n}gram_char_frac"))
    return out.select(*sel)


def bigram_lm_scores(df: DataFrame, model_docs: "DataFrame | None" = None,
                     k: float = 1.0, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Statistical-LM quality scoring (the CCNet / CC-Net-descendant filter:
    score each document's perplexity under an n-gram model and threshold) →
    (doc_id, n_bigrams, cross_entropy, perplexity).

    The model is an add-``k`` (Lidstone) smoothed word-bigram LM trained on
    ``model_docs`` (a reference corpus; defaults to ``df`` itself —
    self-perplexity, which still separates fluent text from degenerate or
    boilerplate docs):  P(w|v) = (c(v,w) + k) / (c(v) + k·V), with c(v) the
    count of v as a bigram prefix and V the model's distinct-token count.
    cross_entropy is bits per bigram (−mean log2 P), perplexity is
    2^cross_entropy; docs with fewer than two tokens get (0, 0.0, 1.0).
    Tokenization is the dedup family's (lowercase alnum runs).

    Scale shape: training is two groupBy counts over exploded bigrams
    (map-side partial aggregation); scoring joins per-doc bigram
    multiplicities against the count tables keyed on the bigram/prefix —
    both sides pre-aggregated so key multiplicity is 1 and hot n-grams
    ('of the') cost one probe, not a fan-out. V is a 1-row broadcast. No
    Python, no window, no driver loop."""
    from nextsearch_api_spark.operators.curation import _gram_expr

    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    model = model_docs if model_docs is not None else df

    grams = F.explode(_gram_expr(text_col, 2)).alias("gram")
    model_bi = (
        model.select(grams)
        .groupBy("gram").agg(F.count("*").cast("long").alias("c_vw"))
    )
    model_prefix = (
        model_bi.groupBy(F.split("gram", " ").getItem(0).alias("prefix"))
        .agg(F.sum("c_vw").alias("c_v"))
    )
    vocab = (
        model.select(F.explode(_gram_expr(text_col, 1)).alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("vocab_size"))
    )

    doc_bi = (
        df.select(F.col(id_col).alias("doc_id"), grams)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("m"))
    )
    scored = (
        doc_bi.join(model_bi, "gram", "left")
        .withColumn("prefix", F.split("gram", " ").getItem(0))
        .join(model_prefix, "prefix", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id", "m",
            (F.log2((F.coalesce("c_vw", F.lit(0)) + F.lit(float(k)))
                    / (F.coalesce("c_v", F.lit(0))
                       + F.lit(float(k)) * F.col("vocab_size")))
             ).alias("logp"),
        )
        .groupBy("doc_id")
        .agg(F.sum("m").alias("n_bigrams"),
             (-F.sum(F.col("m") * F.col("logp")) / F.sum("m")).alias("h"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.coalesce("h", F.lit(0.0)), 6).alias("cross_entropy"),
            F.round(F.pow(F.lit(2.0), F.coalesce("h", F.lit(0.0))), 6)
            .alias("perplexity"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling polynomial fingerprint over kept tokens
    (near-identity signature; cheap doc version stamp)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            "aggregate("
            f"  filter(split(lower({text_col}), '[^a-z0-9]+'),"
            f"         x -> x != '' AND length(x) >= 2 AND x NOT IN ({_SW_SQL})),"
            "  cast(0 as bigint),"
            "  (acc, t) -> (acc * 31 + cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % 1000000) % 1000000007"
            ")"
        ).alias("fingerprint"),
    )
