#!/usr/bin/env python
"""spark-submit entrypoint: media table -> real decode -> stats, content
features, near-duplicate detection, thumbnails — the multimodal side of
the engine as one deployable job.

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_media.py \
        --output /path/media_out \
        [--media <parquet-path-or-iceberg-table> | --synth N] \
        [--synth-size 32] [--feature-dim 16] [--near-dup-threshold 0.98] \
        [--max-bucket 100000] [--thumb 8x8]

Stages (all REAL decode for BMP/WAV payloads; compressed formats are
skipped by the decoders' validation — the honest codec split documented
in ``functions/multimodal.py``):

1. metadata stats  — per-kind counts/bytes/durations, pure JVM
2. decode stats    — ``image_stats`` (dims + per-channel means) and
                     ``audio_stats`` (rate, samples, RMS) from actual
                     payload bytes inside Arrow-batched ``mapInPandas``
3. content features — ``image_features`` grayscale histograms ->
                     LSH-bucketed cosine near-dup pairs over them
                     (``embedding_near_dup_pairs``; ``--max-bucket``
                     caps degenerate buckets at crawl scale)
4. thumbnails      — nearest-neighbor ``resize_images`` re-encoded as
                     real BMPs, written as a side table

``--synth N`` builds a deterministic N-row media table (real BMP + WAV
payloads from the closed-form pattern in ``synth_bmp_media``/
``synth_wav_media``) so the job is runnable with no external data; ids
that differ by a multiple of 256 produce identical images (the pattern
is mod-256), giving the near-dup stage planted true positives.

Prints ONE JSON line with per-stage row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import (  # noqa: E402
    audio_stats,
    image_features,
    image_stats,
    media_metadata_stats,
    resize_images,
    synth_bmp_media,
    synth_wav_media,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", default=None,
                    help="existing media table (MEDIA_SCHEMA columns)")
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--synth", type=int, default=None,
                    help="synthesize N media rows (N BMPs + N WAVs)")
    ap.add_argument("--synth-size", type=int, default=32)
    ap.add_argument("--feature-dim", type=int, default=16)
    ap.add_argument("--near-dup-threshold", type=float, default=0.98)
    ap.add_argument("--max-bucket", type=int, default=None)
    ap.add_argument("--thumb", default="8x8")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-media").getOrCreate()
    if args.media:
        media = spark.read.format(args.format).load(args.media)
    elif args.synth:
        ids = spark.range(args.synth).select(F.col("id").alias("doc_id"))
        s = args.synth_size
        media = synth_bmp_media(ids, w=s, h=s).unionByName(
            synth_wav_media(ids, n=1024, rate=8000))
    else:
        raise SystemExit("pass --media or --synth N")

    report: dict = {"input": media.count()}
    report["by_kind"] = {
        r["kind"]: {"n": int(r["n"]), "bytes": int(r["total_bytes"])}
        for r in media_metadata_stats(media).collect()}

    im = image_stats(media)
    au = audio_stats(media)
    im.write.mode("overwrite").format(args.format) \
        .save(args.output + "_image_stats")
    au.write.mode("overwrite").format(args.format) \
        .save(args.output + "_audio_stats")
    report["images_decoded"] = im.count()
    report["audio_decoded"] = au.count()

    feats = image_features(media, dim=args.feature_dim) \
        .localCheckpoint(eager=True)
    pairs = embedding_near_dup_pairs(
        feats, dim=args.feature_dim, threshold=args.near_dup_threshold,
        id_col="media_id", vec_col="feature", max_bucket=args.max_bucket)
    pairs.write.mode("overwrite").format(args.format) \
        .save(args.output + "_near_dup")
    report["feature_rows"] = feats.count()
    report["near_dup_pairs"] = pairs.count()

    tw, th = (int(x) for x in args.thumb.split("x"))
    thumbs = resize_images(media.filter(F.col("kind") == "image"),
                           width=tw, height=th)
    thumbs.write.mode("overwrite").format(args.format) \
        .save(args.output + "_thumbs")
    report["thumbnails"] = thumbs.count()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
