from pipelinedp_spark.operators import (asof, bpe, clustering, decontam,
                                        dedup, funnel, graph, jpeg,
                                        langid, mixing, multimodal,
                                        packing, quality, ranges,
                                        retrieval, running, scd,
                                        semdedup, sessions, similarity,
                                        skew, video)  # noqa: F401
from pipelinedp_spark.functions import text  # noqa: F401
