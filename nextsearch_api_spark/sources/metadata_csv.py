"""CSV metadata source + display transforms — reference parity for the
CORD-19-shaped deployment (S1/T6/T7 in SURVEY.md §2).

The retargeted engine reads its corpus from the Iceberg/Parquet table, but
the reference's metadata path is kept as a supported source so a NextSearch
user can bring the original ``metadata.csv``:

  * quote-aware CSV parsing (reference hand-rolls it: csv_row
    src/api_metadata.cpp:13-42, quote-escape variant
    scripts/slice_cord19.cpp:101-128) → ``spark.read.csv`` with RFC-4180
    quote/escape options — Spark's reader implements the same dialect.
  * lazy row hydration (the reference keeps only {uid → byte offset} and
    seeks on demand, api_metadata.cpp:109-185) → columnar projection +
    predicate pushdown on uid: reading 2 columns of N rows instead of whole
    rows is the columnar analog of the 16-bytes-per-doc trick.
  * display transforms: first_author_et_al (api_metadata.cpp:60-106,
    semantics replicated exactly incl. the parenthesized-romanization rule),
    url first-of-';'-list (api_engine.cpp:525-527).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# CORD-19 metadata.csv columns the reference consumes (api_metadata.cpp uses
# cord_uid/title/abstract/authors/url/publish_time by header position)
METADATA_COLUMNS = ["cord_uid", "title", "abstract", "authors", "url",
                    "publish_time"]


def read_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """RFC-4180 CSV read matching the reference's hand-rolled parser:
    '"' quotes, '""' escapes, embedded newlines allowed in quoted fields."""
    return (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )


def hydrate_by_uid(meta: DataFrame, uids: list[str],
                   columns: list[str] | None = None) -> DataFrame:
    """Lazy metadata fetch: project + push down the uid predicate — only the
    requested columns/rows are read (the reference's seek-by-offset analog)."""
    cols = columns or METADATA_COLUMNS
    return meta.where(F.col("cord_uid").isin(uids)).select(*cols)


def first_author_et_al(col: Column | str) -> Column:
    """'Smith, J.; Doe, A.' → 'Smith et al.' — exact port of
    first_author_et_al (src/api_metadata.cpp:60-106):
      1. first ';'-separated author, trimmed, trailing commas stripped
      2. if it starts with '(', use the parenthesized (romanized) inner text
      3. surname = text before the first ',' if any, else the last word
      4. surname + ' et al.' (empty input → empty string)
    """
    c = F.col(col) if isinstance(col, str) else col
    first = F.trim(F.split(c, ";").getItem(0))
    first = F.trim(F.regexp_replace(first, r"[,\s]+$", ""))
    inside = F.regexp_extract(first, r"^\((.*?)\)", 1)
    first = F.when(
        first.startswith("(") & (F.trim(inside) != ""), F.trim(inside)
    ).otherwise(first)
    has_comma = first.contains(",")
    before_comma = F.trim(F.split(first, ",").getItem(0))
    last_word = F.trim(F.element_at(F.split(F.trim(first), r"[ \t]+"), -1))
    surname = F.trim(F.when(has_comma, before_comma).otherwise(last_word))
    return F.when(surname == "", F.lit("")).otherwise(
        F.concat(surname, F.lit(" et al."))
    )


def url_first(col: Column | str) -> Column:
    """Truncate a ';'-separated url list at the first entry
    (reference: api_engine.cpp:525-527)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.split(c, ";").getItem(0))
