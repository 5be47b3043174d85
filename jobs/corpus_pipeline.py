"""spark-submit entry for the training-data prep pipeline: quality
filter → dedup (exact + MinHash-LSH clusters) → deterministic split.

Usage (sandbox / local):

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/corpus_pipeline.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /data/corpus_out

Outputs under ``--output``:
    corpus/   surviving documents with (cluster_id, split, doc_tokens,
              shard_group, shard_idx) columns — the deduplicated,
              quality-gated, split-assigned, shard-packed corpus
    stats/    one-row parquet of per-stage counts (auditing)

Every stage is deterministic (content-keyed hashes, no rand()), so a
re-run over the same input produces byte-identical assignments — the
property that makes the corpus reproducible across cluster sizes and
retries.  Composes the oracle-checked operators:
textstats.corpus_filter, dedup.exact_dedup/dedup_clusters,
sampling.hash_split.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def run_corpus(
    spark, docs, out, split_weights=None,
    sample_rates=None, sample_default=1.0, compact=False,
    normalize=False, line_dedup_stage=False,
):
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.dedup import dedup_clusters
    from gclog_parser_spark.operators.sampling import (
        hash_split,
        stratified_sample,
    )
    from gclog_parser_spark.operators.textstats import corpus_filter

    n_input = docs.count()

    # 0. optional per-language down-sampling (deterministic)
    n_sampled_out = 0
    if sample_rates:
        sampled = stratified_sample(
            docs, rates=sample_rates, default_rate=sample_default
        )
        n_sampled_out = n_input - sampled.count()
        docs = sampled

    # 0b. optional Unicode/whitespace normalization (scan-side rewrite)
    if normalize:
        from gclog_parser_spark.operators.textstats import (
            normalize_text_col,
        )

        docs = docs.withColumn("text", normalize_text_col("text"))

    # 0c. optional corpus-wide exact line dedup (C4 keep-first rule);
    # the surviving text replaces the raw column for every later stage
    n_lines_dropped = 0
    if line_dedup_stage:
        from gclog_parser_spark.operators.textstats import line_dedup

        ld = line_dedup(docs, return_text=True)
        n_lines_dropped = (
            ld.agg(F.sum("n_dropped")).collect()[0][0] or 0
        )
        docs = docs.drop("text").join(
            ld.select("doc_id", F.col("kept_text").alias("text")),
            "doc_id",
        )

    # 1. quality gate
    verdict = corpus_filter(docs)
    kept = docs.join(
        verdict.where(F.col("keep")).select("doc_id"), "doc_id"
    )
    reject_counts = {
        r["reject_reason"]: r["n"]
        for r in verdict.where(~F.col("keep"))
        .groupBy("reject_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # 2. near-dup clustering on the gated docs; keep cluster minima
    clusters = dedup_clusters(kept)
    surviving = kept.join(
        clusters.where(F.col("is_keeper")).select(
            "doc_id", "cluster_id"
        ),
        "doc_id",
    )

    # 3. deterministic split assignment + token-budget shard packing
    from gclog_parser_spark.operators.sampling import shard_by_tokens

    final = hash_split(surviving, weights=split_weights).join(
        shard_by_tokens(surviving).select(
            "doc_id", "doc_tokens", "shard_group", "shard_idx"
        ),
        "doc_id",
    )
    if compact:
        # maintenance-grade layout: split-partitioned dirs, doc_id
        # clustering for footer pruning, bounded file sizes
        from gclog_parser_spark.operators.layout import compact_table

        compact_table(
            final,
            f"{out}/corpus",
            partition_by=["split"],
            sort_by=["doc_id"],
        )
    else:
        final.write.mode("overwrite").parquet(f"{out}/corpus")

    final_back = spark.read.parquet(f"{out}/corpus")
    n_kept = kept.count()
    n_final = final_back.count()
    split_counts = {
        r["split"]: r["n"]
        for r in final_back.groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stats = {
        "n_input": n_input,
        "n_sampled_out": n_sampled_out,
        **(
            {"n_lines_dropped": int(n_lines_dropped)}
            if line_dedup_stage
            else {}
        ),
        "n_quality_rejected": (n_input - n_sampled_out) - n_kept,
        "n_dup_removed": n_kept - n_final,
        "n_final": n_final,
        **{f"reject_{k}": v for k, v in sorted(reject_counts.items())},
        **{f"split_{k}": v for k, v in sorted(split_counts.items())},
    }
    spark.createDataFrame([stats]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/stats")
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="documents parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--train", type=float, default=0.9)
    ap.add_argument("--val", type=float, default=0.05)
    ap.add_argument("--test", type=float, default=0.05)
    ap.add_argument("--master", default=None,
                    help="override (tests); normally spark-submit's")
    ap.add_argument("--sample", default=None,
                    help="per-stratum rates, e.g. 'en=0.5,de=0.25'")
    ap.add_argument("--sample-default", type=float, default=1.0)
    ap.add_argument("--compact", action="store_true",
                    help="write the corpus split-partitioned, "
                         "doc_id-clustered, size-capped")
    ap.add_argument("--normalize", action="store_true",
                    help="NFC + control/whitespace normalization "
                         "before the quality gate")
    ap.add_argument("--line-dedup", action="store_true",
                    help="corpus-wide exact line dedup (keep first "
                         "occurrence) before the quality gate")
    args = ap.parse_args(argv)

    sample_rates = None
    if args.sample:
        sample_rates = {
            k: float(v)
            for k, v in (p.split("=") for p in args.sample.split(","))
        }

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("corpus_pipeline")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    stats = run_corpus(
        spark,
        spark.read.parquet(args.input),
        args.output,
        split_weights={
            "train": args.train, "val": args.val, "test": args.test
        },
        sample_rates=sample_rates,
        sample_default=args.sample_default,
        compact=args.compact,
        normalize=args.normalize,
        line_dedup_stage=args.line_dedup,
    )
    import json

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
