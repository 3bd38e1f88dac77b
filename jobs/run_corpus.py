#!/usr/bin/env python
"""spark-submit entrypoint: raw documents -> cleaned, deduplicated,
decontaminated, split training corpus — the engine's full LLM-data
pipeline composed as one deployable job.

    zip -r engine.zip pagerank_barrierfree_openmp_dynamic_spark
    spark-submit --py-files engine.zip jobs/run_corpus.py \
        --docs <parquet-path-or-iceberg-table> --output /path/corpus \
        [--langs en,de] [--min-quality 0.3] \
        [--boiler-seg-len 6 --boiler-min-docs 2] \
        [--dedup minhash|exact|none] [--threshold 0.5] [--max-bucket 100000] \
        [--eval-docs <path>] [--decon-k 13] \
        [--max-dup-frac 0.5 --dup-span-k 8] [--redact-pii] \
        [--splits train:0.9,val:0.05,test:0.05] [--seed 42]

Stage order (each drops rows before the next pays for them — cheap JVM
filters first, the LSH join last):

1. language filter  — n-gram marker lang-id, pure JVM expressions
2. quality filter   — length/punct/stopword composite >= --min-quality
3. boilerplate strip — per-source repeated-segment removal (CCNet-style);
   documents emptied by the strip are dropped
4. dedup            — exact md5 canonical or MinHash near-dup clusters
                      (keep = cluster-canonical doc)
5. decontamination  — drop documents sharing any k-gram with --eval-docs
                      (broadcast shingle probe; corpus never shuffled)
6. span dedup       — drop documents whose cross-document duplicated-span
                      fraction exceeds --max-dup-frac (Lee-et-al-style
                      ExactSubstr pass; spans hashed before the shuffle)
7. PII redaction    — typed-placeholder rewrite (--redact-pii); clean
                      documents pass through byte-identical
8. splits           — deterministic hash splits (retry-stable, engine-
                      portable), written partitioned by split
9. packing          — optional (--pack-max-tokens): first-fit-in-order
                      training-sequence packing, PER SPLIT (windows never
                      cross split boundaries), written as a side table
                      ``<output>_packing`` of (split, shard, doc_id,
                      n_tokens, bin) window assignments

Prints ONE JSON line with per-stage surviving counts — the funnel a
corpus job is monitored by.

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
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (  # noqa: E402
    decontaminate,
    duplicate_spans,
    remove_boilerplate,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.pii import (  # noqa: E402
    redact_pii,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (  # noqa: E402
    assign_split,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (  # noqa: E402
    lang_id,
    quality_score,
)


def _parse_splits(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, frac = part.split(":")
        out[name.strip()] = float(frac)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--langs", default=None,
                    help="comma list of lang codes to keep (default: all)")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--boiler-seg-len", type=int, default=None,
                    help="enable boilerplate stripping at this segment length")
    ap.add_argument("--boiler-min-docs", type=int, default=2)
    ap.add_argument("--dedup", default="minhash",
                    choices=["exact", "minhash", "none"])
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--max-bucket", type=int, default=None)
    ap.add_argument("--eval-docs", default=None,
                    help="benchmark docs to decontaminate against")
    ap.add_argument("--decon-k", type=int, default=13)
    ap.add_argument("--max-dup-frac", type=float, default=None,
                    help="drop docs whose duplicated-span fraction exceeds")
    ap.add_argument("--dup-span-k", type=int, default=8)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--splits", default="train:0.9,val:0.05,test:0.05")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--pack-max-tokens", type=int, default=None,
                    help="pack each split into fixed-token training "
                         "windows (first-fit-in-order); writes "
                         "<output>_packing")
    ap.add_argument("--pack-shards", type=int, default=32)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("linkgraph-corpus").getOrCreate()
    docs = spark.read.format(args.format).load(args.docs)
    idc, txt = args.id_col, args.text_col
    funnel = {"input": docs.count()}

    if args.langs:
        keep = [s.strip() for s in args.langs.split(",")]
        lid = lang_id(docs, txt, idc).select(idc, "lang_pred")
        docs = (docs.join(lid, idc)
                .filter(F.col("lang_pred").isin(keep)).drop("lang_pred"))
        funnel["after_lang"] = docs.count()

    if args.min_quality is not None:
        q = quality_score(docs, txt, idc).select(idc, "quality")
        docs = (docs.join(q, idc)
                .filter(F.col("quality") >= args.min_quality).drop("quality"))
        funnel["after_quality"] = docs.count()

    if args.boiler_seg_len:
        clean = remove_boilerplate(
            docs, seg_len=args.boiler_seg_len, min_docs=args.boiler_min_docs,
            text_col=txt, id_col=idc, source_col=args.source_col)
        docs = (docs.drop(txt)
                .join(clean.filter(F.col("clean_text") != "")
                      .select(idc, F.col("clean_text").alias(txt)), idc))
        funnel["after_boilerplate"] = docs.count()

    if args.dedup == "exact":
        docs = dedup_exact(docs, txt, idc)
        funnel["after_dedup"] = docs.count()
    elif args.dedup == "minhash":
        clusters = near_dup_clusters(
            docs, txt, idc, n=args.shingle_n, bands=args.bands,
            threshold=args.threshold, max_bucket=args.max_bucket)
        docs = docs.join(
            clusters.filter("keep").select(idc), idc, "left_semi")
        funnel["after_dedup"] = docs.count()

    if args.eval_docs:
        ev = spark.read.format(args.format).load(args.eval_docs)
        hits = decontaminate(docs, ev, k=args.decon_k,
                             text_col=txt, id_col=idc).select(idc)
        docs = docs.join(hits, idc, "left_anti")
        funnel["after_decontamination"] = docs.count()

    if args.max_dup_frac is not None:
        heavy = (duplicate_spans(docs, k=args.dup_span_k,
                                 text_col=txt, id_col=idc)
                 .filter(F.col("dup_frac") > args.max_dup_frac).select(idc))
        docs = docs.join(heavy, idc, "left_anti")
        funnel["after_span_dedup"] = docs.count()

    if args.redact_pii:
        keep = tuple(c for c in docs.columns if c not in (idc, txt))
        red = redact_pii(docs, text_col=txt, id_col=idc, keep_cols=keep)
        funnel["pii_spans_redacted"] = int(
            red.agg(F.sum("n_redacted")).collect()[0][0] or 0)
        docs = red.drop("n_redacted")

    docs = assign_split(docs, idc, _parse_splits(args.splits),
                        seed=args.seed)
    (docs.write.mode("overwrite").partitionBy("split")
         .format(args.format).save(args.output))
    per_split = {r["split"]: r["n"] for r in
                 docs.groupBy("split").agg(F.count("*").alias("n")).collect()}
    funnel["output"] = sum(per_split.values())

    if args.pack_max_tokens:
        from pagerank_barrierfree_openmp_dynamic_spark.functions.packing import (
            pack_greedy,
        )

        parts = []
        for sp in _parse_splits(args.splits):
            parts.append(
                pack_greedy(docs.filter(F.col("split") == sp),
                            max_tokens=args.pack_max_tokens,
                            n_shards=args.pack_shards,
                            text_col=txt, id_col=idc)
                .withColumn("split", F.lit(sp)))
        packed = parts[0]
        for p in parts[1:]:
            packed = packed.unionByName(p)
        (packed.write.mode("overwrite").partitionBy("split")
               .format(args.format).save(args.output + "_packing"))
        m = args.pack_max_tokens
        rep = (spark.read.format(args.format).load(args.output + "_packing")
               .groupBy("split", "shard", "bin")
               .agg(F.sum("n_tokens").alias("fill"))
               .groupBy("split")
               .agg(F.count("*").alias("windows"),
                    (F.avg(F.col("fill") * 1000000 / m))
                    .cast("long").alias("avg_fill_ppm"))
               .collect())
        funnel["packing"] = {
            r["split"]: {"windows": int(r["windows"]),
                         "avg_fill_ppm": int(r["avg_fill_ppm"])}
            for r in rep}

    print(json.dumps({"funnel": funnel, "splits": per_split}))


if __name__ == "__main__":
    main()
