"""spark-submit entry for the data-SELECTION pipeline: score every
document with the corpus-trained CC-Net surprisal model and the
DSIR target-likelihood ratio, drop the per-language tail bucket, then
importance-resample toward the target domain.

Usage (sandbox / local):

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/select_pipeline.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /data/select_out --target-mod 7

Outputs under ``--output``:
    selected/  surviving documents with (n_tokens, surprisal, bucket,
               dsir_score) columns — the head/middle buckets,
               importance-resampled toward the target
    stats/     one-row parquet of per-stage counts (auditing)

Every stage is deterministic: the scores are integer-tick rational
means (bit-reproducible across engines and cluster sizes), the
resampling draw is a content-keyed hash — a re-run over the same
input produces byte-identical selections.  Composes the
oracle-checked operators: textstats.unigram_surprisal_buckets
(`text_ccnet_buckets`), sampling.importance_weights (`corpus_dsir`),
sampling.weighted_sample (`corpus_weighted_sample`).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def run_select(
    spark,
    docs,
    out,
    target_lang: str = "en",
    target_mod: int = 7,
    weight_scale: float = 0.5,
):
    """CC-Net bucket → drop tail → DSIR weight → hash resample.

    ``weight_scale`` maps dsir_score (ratio around ~1) to a keep
    probability; scores ≥ 1/scale keep with certainty.  Returns the
    audit stats dict (also written to ``out``/stats)."""
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.sampling import (
        importance_weights,
        weighted_sample,
    )
    from gclog_parser_spark.operators.textstats import (
        unigram_surprisal_buckets,
    )

    n_input = docs.count()

    # 1. CC-Net surprisal buckets (self-trained unigram model)
    buckets = unigram_surprisal_buckets(docs)
    scored = docs.join(
        buckets.select("doc_id", "n_tokens", "surprisal", "bucket"),
        "doc_id",
    )
    head = scored.where(F.col("bucket") < 3)  # drop the gibberish tail
    n_head = head.count()

    # 2. DSIR importance weights toward the target slice
    target = docs.where(
        (F.col("lang") == target_lang)
        & (F.col("doc_id") % target_mod == 0)
    )
    weights = importance_weights(docs, target).select(
        "doc_id", "dsir_score"
    )
    weighted = head.join(weights, "doc_id").withColumn(
        "keep_p", F.col("dsir_score") * weight_scale
    )

    # 3. deterministic importance resampling (content-keyed draw)
    selected = weighted_sample(weighted, "keep_p").drop("keep_p")
    selected.write.mode("overwrite").parquet(f"{out}/selected")

    back = spark.read.parquet(f"{out}/selected")
    n_selected = back.count()
    lang_counts = {
        r["lang"]: r["n"]
        for r in back.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    stats = {
        "n_input": n_input,
        "n_tail_dropped": n_input - n_head,
        "n_resampled_out": n_head - n_selected,
        "n_selected": n_selected,
        **{f"lang_{k}": v for k, v in sorted(lang_counts.items())},
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
    ap.add_argument("--target-lang", default="en")
    ap.add_argument("--target-mod", type=int, default=7,
                    help="target slice = target-lang docs with "
                         "doc_id %% mod == 0")
    ap.add_argument("--weight-scale", type=float, default=0.5)
    ap.add_argument("--master", default=None,
                    help="override (tests); normally spark-submit's")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("select_pipeline")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    stats = run_select(
        spark,
        spark.read.parquet(args.input),
        args.output,
        target_lang=args.target_lang,
        target_mod=args.target_mod,
        weight_scale=args.weight_scale,
    )
    import json

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
