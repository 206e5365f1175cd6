from pipelinedp_spark.operators import (asof, bpe, decontam, dedup, graph,
                                        jpeg, mixing, multimodal, packing,
                                        quality, ranges, retrieval,
                                        running, semdedup, sessions,
                                        similarity, video)  # noqa: F401
from pipelinedp_spark.functions import text  # noqa: F401
