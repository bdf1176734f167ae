from nextsearch_api_spark.sources.corpus import (  # noqa: F401
    CORPUS_SCHEMA,
    generate_corpus,
    read_corpus,
    write_corpus,
)
