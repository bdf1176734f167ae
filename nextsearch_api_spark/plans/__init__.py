from nextsearch_api_spark.plans.checkpoint import BuildManifest, StageRunner  # noqa: F401
