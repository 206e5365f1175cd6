from pipelinedp_spark.operators import (asof, bpe, dedup, graph, jpeg,
                                        multimodal, quality, ranges,
                                        running, sessions,
                                        similarity)  # noqa: F401
