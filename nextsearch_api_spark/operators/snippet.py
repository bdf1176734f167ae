"""Result snippets with query-term highlighting — the serving nicety the
reference's result payload stops short of (its hits return metadata only,
``src/api_engine.cpp:506-528``; search UIs add the text window client-side).

Pure-codegen construction, no Python in the row path:

- the query is parsed with the REFERENCE tokenizer (len≥2 non-stopwords —
  the same terms the BM25 tier matched, so the snippet shows why the doc
  ranked),
- the window anchors on the EARLIEST occurrence of any query term in
  lower(text) (per-term ``locate``, absent terms pushed to +inf before
  ``least``),
- ``substring`` takes ±width chars around the anchor from the ORIGINAL
  text (positions computed on the lowercased twin — identical offsets for
  ASCII; for case-folds that change codepoint length the window may shift
  by the length delta, an accepted presentation-layer approximation),
- every term occurrence inside the window is wrapped in ``**…**`` via one
  case-insensitive alternation regexp (query tokens are [a-z0-9]+ by
  construction — nothing to escape).

Scale shape: one projection over the (already top-k-bounded) hit set, or
over a corpus scan if called standalone — all JVM expressions.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snippets"]

_ABSENT = 1 << 30  # sentinel "term not present" position


def snippets(docs: DataFrame, query: str, width: int = 40,
             id_col: str = "doc_id", text_col: str = "text",
             keep_misses: bool = False) -> DataFrame:
    """→ (id, first_pos, snippet): the highlighted ±``width``-char window
    around the earliest query-term occurrence. Docs containing no query
    term are dropped unless ``keep_misses`` (then first_pos/snippet are
    NULL). Raises if the query has no indexable terms."""
    from nextsearch_api_spark.operators.query import parse_query

    if width <= 0:
        raise ValueError("width must be positive")
    terms = sorted(set(parse_query(query)))
    if not terms:
        raise ValueError("query has no indexable terms (len>=2, non-stopword)")

    low = F.lower(F.col(text_col))
    pos_cols = [
        F.when(F.locate(t, low) > 0, F.locate(t, low)).otherwise(_ABSENT)
        for t in terms
    ]
    first = F.least(*pos_cols) if len(pos_cols) > 1 else pos_cols[0]
    start = F.greatest(F.lit(1), first - width)
    window = F.substring(F.col(text_col), start, 2 * width)
    marked = F.regexp_replace(
        window, "(?i)(" + "|".join(terms) + ")", r"**$1**")

    out = docs.withColumn("_fp", first).withColumn(
        "first_pos",
        F.when(F.col("_fp") < _ABSENT, F.col("_fp")).cast("long"))
    snip = F.when(F.col("_fp") < _ABSENT, marked)
    out = out.select(F.col(id_col), "first_pos", snip.alias("snippet"))
    return out if keep_misses else out.where(F.col("first_pos").isNotNull())
