"""CSV metadata source + display transforms (S1/T6/T7 parity)."""

import pytest
from pyspark.sql import functions as F

from nextsearch_api_spark.sources.metadata_csv import (
    first_author_et_al, hydrate_by_uid, read_metadata_csv, url_first,
)


def _ref_first_author(s: str) -> str:
    """Python port of the reference C++ (oracle for the Spark expr)."""
    s = s.strip()
    if not s:
        return ""
    first = s.split(";")[0].strip()
    first = first.rstrip(", \t").strip()
    if not first:
        return ""
    if first.startswith("("):
        close = first.find(")")
        if close > 1:
            inside = first[1:close].strip()
            if inside:
                first = inside
    if "," in first:
        surname = first.split(",")[0].strip()
    else:
        tmp = first.strip()
        sp = max(tmp.rfind(" "), tmp.rfind("\t"))
        surname = tmp if sp == -1 else tmp[sp + 1:].strip()
    surname = surname.strip()
    return f"{surname} et al." if surname else ""


AUTHOR_CASES = [
    "Smith, J.; Doe, A.",
    "John Smith; Jane Doe",
    "(Zhang) 张伟, W.; Li, X.",
    "  Garcia-Lopez, Maria ;Chen, B",
    "Single",
    "",
    "  ,  ; x",
    "(  ) Doe, J.",
]


def test_first_author_matches_reference_port(spark):
    df = spark.createDataFrame([(a,) for a in AUTHOR_CASES], "authors string")
    rows = df.select("authors", first_author_et_al("authors").alias("d")).collect()
    for r in rows:
        assert r["d"] == _ref_first_author(r["authors"]), repr(r["authors"])


def test_csv_roundtrip_and_hydration(spark, tmp_path):
    p = tmp_path / "metadata.csv"
    p.write_text(
        'cord_uid,title,abstract,authors,url,publish_time\n'
        'u1,"Title, with comma","Abs ""quoted"" text","Smith, J; Doe, A",'
        'http://a;http://b,2020-01-01\n'
        'u2,Plain,"multi\nline abstract",Single,http://c,2020-02-02\n'
    )
    meta = read_metadata_csv(spark, str(p))
    assert meta.count() == 2
    r1 = hydrate_by_uid(meta, ["u1"]).collect()[0]
    assert r1["title"] == "Title, with comma"
    assert r1["abstract"] == 'Abs "quoted" text'
    got = meta.select("cord_uid", url_first("url").alias("u")).collect()
    urls = {r["cord_uid"]: r["u"] for r in got}
    assert urls == {"u1": "http://a", "u2": "http://c"}
    r2 = hydrate_by_uid(meta, ["u2"]).collect()[0]
    assert r2["abstract"] == "multi\nline abstract"


def test_corpus_formats_roundtrip(spark, tiny_corpus, tmp_path):
    """Corpus source/sink formats: parquet/orc/json/csv all round-trip the
    exact table (content carries newlines, quotes, unicode); reads use the
    explicit schema, never inference."""
    import pytest

    from nextsearch_api_spark.sources.corpus import read_corpus, write_corpus

    def rows(df):
        return sorted(
            (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
            for r in df.select("repo", "path", "commit", "lang",
                               "content").collect())

    want = rows(tiny_corpus)
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / f"c_{fmt}")
        write_corpus(tiny_corpus, p, partition_by=None, fmt=fmt)
        got = rows(read_corpus(spark, p, fmt=fmt))
        assert got == want, fmt

    # partitioned non-parquet write keeps the partition column on read
    p = str(tmp_path / "c_json_part")
    write_corpus(tiny_corpus, p, partition_by="lang", fmt="json")
    assert rows(read_corpus(spark, p, fmt="json")) == want

    with pytest.raises(ValueError, match="fmt"):
        write_corpus(tiny_corpus, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError, match="fmt"):
        read_corpus(spark, str(tmp_path / "c_parquet"), fmt="avro")


def test_corpus_roundtrip_permuted_columns(spark, tiny_corpus, tmp_path):
    """ADVICE r4 #4: a caller-side column permutation must not round-trip
    with silently swapped columns through the positional explicit-schema
    readers — write_corpus canonicalizes the on-disk order, and the CSV
    reader validates header names (enforceSchema=false)."""
    from nextsearch_api_spark.sources.corpus import read_corpus, write_corpus

    def rows(df):
        return sorted(
            (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
            for r in df.select("repo", "path", "commit", "lang",
                               "content").collect())

    want = rows(tiny_corpus)
    permuted = tiny_corpus.select("content", "lang", "repo", "commit", "path")
    for fmt in ("csv", "orc", "parquet"):
        p = str(tmp_path / f"perm_{fmt}")
        write_corpus(permuted, p, partition_by=None, fmt=fmt)
        assert rows(read_corpus(spark, p, fmt=fmt)) == want, fmt
