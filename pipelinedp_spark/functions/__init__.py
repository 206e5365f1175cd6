from pipelinedp_spark.functions import (embeddings, layout, pii,
                                        sampling, semistructured,
                                        sketches, text, urls)  # noqa: F401
