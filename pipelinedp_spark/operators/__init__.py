from pipelinedp_spark.operators import (anonymity, asof, bpe, chat,
                                        clustering,
                                        decontam, dedup, funnel, graph,
                                        jpeg, langid, mixing, multimodal,
                                        packing, quality, ranges, release,
                                        retrieval, running, scd,
                                        semdedup, sessions, similarity,
                                        skew, video)  # noqa: F401
from pipelinedp_spark.functions import text  # noqa: F401
