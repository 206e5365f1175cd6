from pipelinedp_spark.functions import (embeddings, layout, sampling,
                                        sketches, text, urls)  # noqa: F401
