from pipelinedp_spark.operators import (asof, dedup, multimodal, ranges,
                                        running, sessions,
                                        similarity)  # noqa: F401
