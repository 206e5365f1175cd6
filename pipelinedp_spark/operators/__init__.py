from pipelinedp_spark.operators import (asof, bpe, decontam, dedup, graph,
                                        jpeg, mixing, multimodal, packing,
                                        quality, ranges, retrieval,
                                        running, semdedup, sessions,
                                        similarity)  # noqa: F401
