from nextsearch_api_spark.functions.text import (  # noqa: F401
    STOPWORDS,
    tokens_expr,
    kept_tokens_expr,
    tokenize_py,
)
