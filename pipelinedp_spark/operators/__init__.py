from pipelinedp_spark.operators import dedup, similarity  # noqa: F401
