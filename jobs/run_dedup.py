#!/usr/bin/env python
"""spark-submit entrypoint: documents -> near-dup detection -> canonical set.

The training-data side of the engine as a deployable job (the pipeline a
crawl corpus runs before graph building):

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_dedup.py \
        --docs <iceberg-table-or-parquet-path> \
        --output /path/dedup [--method exact|minhash|simhash] \
        [--threshold 0.5] [--bands 8] [--max-hamming 2] \
        [--max-bucket 100000] [--keep-only]

Methods:

- ``exact``   — md5 hash-groupBy; output is the canonical (min-id) rows.
- ``minhash`` — shingle -> banded MinHash -> bucket join -> exact-Jaccard
  verify -> connected-components clustering; output is (doc_id, cluster,
  keep). ``--keep-only`` writes just the canonical documents.
- ``simhash`` — 16-bit SimHash, pigeonhole-blocked Hamming join; output is
  the verified near-dup pairs (a, b, hamming).

``--max-bucket`` enables the degenerate-bucket k² cap on the LSH-family
joins (boilerplate segments / hot buckets) — recommended at crawl scale;
omitted = exact candidate enumeration.

On a real cluster the session comes from spark-submit's conf;
``getOrCreate()`` inherits it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pagerank_barrierfree_openmp_dynamic_spark.functions import (  # noqa: E402
    dedup_exact,
    near_dup_clusters,
    simhash,
    simhash_near_dup_pairs,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="documents table path (parquet dir or iceberg table)")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="minhash",
                    choices=["exact", "minhash", "simhash"])
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="minhash: exact-Jaccard verify threshold")
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--max-hamming", type=int, default=2)
    ap.add_argument("--max-bucket", type=int,
                    help="k^2 cap: skip LSH buckets / SimHash blocks "
                         "larger than this for pair generation")
    ap.add_argument("--keep-only", action="store_true",
                    help="minhash: write only the canonical documents")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-dedup").getOrCreate()
    docs = spark.read.format(args.format).load(args.docs)
    n_in = docs.count()

    if args.method == "exact":
        out = dedup_exact(docs, args.text_col, args.id_col)
        stats = {"n_docs": n_in, "n_kept": out.count()}
    elif args.method == "minhash":
        out = near_dup_clusters(
            docs, args.text_col, args.id_col, n=args.shingle_n,
            bands=args.bands, threshold=args.threshold,
            max_bucket=args.max_bucket,
        )
        n_kept = out.filter("keep").count()
        if args.keep_only:
            keep = out.filter("keep").select(
                F.col(args.id_col))
            out = docs.join(keep, args.id_col, "left_semi")
        stats = {"n_docs": n_in, "n_kept": n_kept}
    else:
        sig = simhash(docs, args.text_col, args.id_col)
        out = simhash_near_dup_pairs(
            sig, args.id_col, max_hamming=args.max_hamming,
            max_block=args.max_bucket,
        )
        stats = {"n_docs": n_in, "n_pairs": out.count()}

    out.write.mode("overwrite").format(args.format).save(args.output)
    print(json.dumps({"method": args.method, **stats}))


if __name__ == "__main__":
    main()
