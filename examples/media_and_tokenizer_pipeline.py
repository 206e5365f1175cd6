"""Round-4 media + tokenizer tour: real codec pipeline and BPE training.

1. Build a mixed-format image corpus (BMP / PNG / baseline JPEG, all
   encoded by the engine's own stdlib-only codecs; GIF is decode-only,
   exercised in tests), carry it as an
   opaque binary column, and run real metadata parsing, pixel statistics
   and resizing — no codec library anywhere.
2. Train BPE merges on the documents corpus without collecting the word
   table, then encode documents and compare token counts.

    python examples/media_and_tokenizer_pipeline.py [sf_dir]
"""

import sys

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from pipelinedp_spark.operators import multimodal as MM  # noqa: E402
from pipelinedp_spark.operators.bpe import (apply_bpe,  # noqa: E402
                                            train_bpe_merges)
from pipelinedp_spark.operators.jpeg import encode_jpeg  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("media-and-tokenizer")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. mixed-format media column ------------------------------------
    rng = np.random.RandomState(7)
    rows = []
    for i in range(12):
        yy, xx = np.mgrid[0:16 + i, 0:20 + i]
        img = np.stack([(xx * 9) % 256, (yy * 7) % 256,
                        ((xx + yy) * 5) % 256], -1).astype(np.uint8)
        kind = i % 3
        if kind == 0:
            payload = MM.encode_bmp(img)
        elif kind == 1:
            payload = MM.encode_png(img)
        else:
            payload = encode_jpeg(img, subsample=True)
        rows.append((i, bytearray(payload)))
    media = spark.createDataFrame(rows, "img_id long, image binary")

    with_meta = MM.extract_image_metadata(media)
    stats = MM.image_pixel_stats(with_meta)
    print("== mixed-format corpus: real headers + real pixel stats ==")
    stats.select("img_id", "meta.format", "meta.width", "meta.height",
                 "px_sum", "px_min", "px_max").orderBy("img_id").show(12)

    resized = MM.resize_images(with_meta, width=8, height=8,
                               decoder="native")
    re_stats = MM.image_pixel_stats(resized)
    print("== after native 8x8 resize (re-encoded in source container) ==")
    re_stats.select("img_id", "px_width", "px_height").orderBy(
        "img_id").show(4)

    # -- 2. distributed BPE ----------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe_merges(docs, num_merges=30)
    print(f"== learned {len(merges)} BPE merges; first 10: "
          f"{merges[:10]} ==")
    enc = apply_bpe(docs.select("doc_id", "text"), merges)
    comparison = enc.select(
        F.size(F.split("text", " ")).alias("words"),
        F.size("bpe_tokens").alias("bpe")).agg(
        F.sum("words").alias("total_words"),
        F.sum("bpe").alias("total_bpe_tokens")).first()
    print(f"corpus words={comparison['total_words']} -> "
          f"bpe tokens={comparison['total_bpe_tokens']}")
    spark.stop()


if __name__ == "__main__":
    main()
