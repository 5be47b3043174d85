"""spark-submit entry for the TOKENIZER-TRAINING pipeline: clean the
corpus, dedup it, learn a BPE merge table from the survivors, encode
every kept document with it, and pack the encoded corpus into
fixed-length training sequences.

Usage (sandbox / local):

    zip -qr /tmp/gps.zip gclog_parser_spark
    spark-submit --master 'local[32]' --py-files /tmp/gps.zip \
        jobs/tokenize_pipeline.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /data/tok_out --n-merges 8 --seq-len 128

Outputs under ``--output``:
    merges/     the learned merge table (step, lhs, rhs, n)
    encoded/    per-doc subword counts under the trained tokenizer
    packed/     (doc_id, pack_group, seq_idx, tok_start, tok_end) spans
    stats/      one-row parquet of per-stage counts (auditing)

Every stage is deterministic (content-keyed hashes, BIGINT argmax
total order, no rand()): a re-run over the same input produces
byte-identical merges, encodings, and packing.  Composes the
oracle-checked operators: textstats.corpus_filter (`corpus_filter`),
dedup.exact_dedup (`dedup_exact`), tokenizer.bpe_merges
(`text_bpe_merges`), tokenizer.bpe_encode, sampling.pack_sequences
(`corpus_pack`).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "gclog_parser_spark")):
    sys.path.insert(0, _REPO)


def run_tokenize(
    spark,
    docs,
    out,
    n_merges: int = 8,
    seq_len: int = 128,
    n_groups: int = 8,
):
    """filter → exact dedup → BPE train → encode → pack.

    Returns the audit stats dict (also written to ``out``/stats).
    The merge table is learned from the DEDUPED corpus — training the
    tokenizer on duplicated text over-weights boilerplate merges, the
    same reason dedup precedes tokenizer training in production."""
    import pyspark.sql.functions as F

    from gclog_parser_spark.operators.dedup import exact_dedup
    from gclog_parser_spark.operators.sampling import pack_sequences
    from gclog_parser_spark.operators.textstats import corpus_filter
    from gclog_parser_spark.operators.tokenizer import (
        bpe_encode,
        bpe_merges,
    )

    n_input = docs.count()

    # 1. quality gate
    kept = docs.join(
        corpus_filter(docs).where("keep").select("doc_id"), "doc_id"
    )
    n_kept = kept.count()

    # 2. exact dedup: keeper doc per content hash
    keepers = exact_dedup(kept).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    deduped = kept.join(keepers, "doc_id")
    n_deduped = deduped.count()

    # 3. learn the merge table from the deduped corpus
    merges_df = bpe_merges(deduped, n_merges=n_merges)
    merges_df.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/merges"
    )
    merge_rows = (
        spark.read.parquet(f"{out}/merges").orderBy("step").collect()
    )

    # 4. encode every kept doc with the trained tokenizer
    encoded = bpe_encode(deduped, merge_rows)
    encoded.write.mode("overwrite").parquet(f"{out}/encoded")
    total_subwords = (
        spark.read.parquet(f"{out}/encoded")
        .agg(F.sum("n_subwords"))
        .first()[0]
    )

    # 5. pack into fixed-length training sequences (whitespace-token
    # budget — the packing step is tokenizer-agnostic by design)
    packed = pack_sequences(
        deduped, seq_len=seq_len, n_groups=n_groups
    )
    packed.write.mode("overwrite").parquet(f"{out}/packed")
    pk = spark.read.parquet(f"{out}/packed")
    n_sequences = (
        pk.select("pack_group", "seq_idx").distinct().count()
    )

    stats = {
        "n_input": n_input,
        "n_filtered_out": n_input - n_kept,
        "n_dup_dropped": n_kept - n_deduped,
        "n_trained_on": n_deduped,
        "n_merges": len(merge_rows),
        "total_subwords": int(total_subwords),
        "n_sequences": n_sequences,
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
    ap.add_argument("--n-merges", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--n-groups", type=int, default=8)
    ap.add_argument("--master", default=None,
                    help="override (tests); normally spark-submit's")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("tokenize_pipeline")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    stats = run_tokenize(
        spark,
        spark.read.parquet(args.input),
        args.output,
        n_merges=args.n_merges,
        seq_len=args.seq_len,
        n_groups=args.n_groups,
    )
    import json

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
