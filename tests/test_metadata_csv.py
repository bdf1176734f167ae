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
