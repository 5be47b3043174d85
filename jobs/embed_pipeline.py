"""spark-submit entry for embedding-serving prep: int8-quantize the
corpus, write the serving table + LSH bucket index, and audit the
reconstruction error.

Usage (sandbox / local):

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/embed_pipeline.py \
        --input /root/testdata/sf0.01/embeddings.parquet \
        --output /data/emb_out

Outputs under ``--output``:
    quantized/  (vec_id, label, scale, qvec array<tinyint>) — the 4x
                smaller serving table `quantized_scan_topk` scans
    buckets/    (vec_id, bucket) LSH bucket assignments — the blocking
                index for `lsh_bucket_topk` / `neardup_pairs`
    stats/      one-row parquet: corpus size, fp32/int8 byte sizes,
                per-corpus worst reconstruction error, bucket count

Deterministic end-to-end (hash planes from a fixed seed, round-half-up
quantization): a re-run over the same input produces identical
assignments, so the serving tables are reproducible across retries —
the same property `jobs/corpus_pipeline.py` guarantees for text.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def run_embed(spark, emb, out: str, seed: int = 42) -> dict:
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.similarity import (
        lsh_buckets,
        quantization_error,
        quantize_embeddings,
    )

    quant_path = os.path.join(out, "quantized")
    bucket_path = os.path.join(out, "buckets")
    stats_path = os.path.join(out, "stats")

    qz = quantize_embeddings(emb)
    qz.write.mode("overwrite").parquet(quant_path)

    buckets = lsh_buckets(emb, seed=seed).select("vec_id", "bucket")
    buckets.write.mode("overwrite").parquet(bucket_path)

    # audits are tiny grouped aggregates — the only driver collects
    err = quantization_error(emb).agg(
        F.sum("n_vecs").alias("n_vecs"),
        F.max("worst_err").alias("worst_err"),
        F.max("worst_rel_err").alias("worst_rel_err"),
    ).head()
    n_buckets = (
        spark.read.parquet(bucket_path).select("bucket").distinct().count()
    )
    stats = {
        "n_vecs": err["n_vecs"],
        "worst_err": float(err["worst_err"]),
        "worst_rel_err": float(err["worst_rel_err"]),
        "n_buckets": n_buckets,
        "int8_bytes": _dir_bytes(quant_path),
    }
    spark.createDataFrame([stats]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stats_path)
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    from gclog_parser_spark.session import get_spark

    spark = get_spark()
    emb = spark.read.parquet(args.input)
    stats = run_embed(spark, emb, args.output, seed=args.seed)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
