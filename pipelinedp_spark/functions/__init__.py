from pipelinedp_spark.functions import text  # noqa: F401
