"""Subprocess body for tests/test_retry_determinism.py: run the
deterministic selection chain (hash_split + weighted draw + exact
dedup keeper) under ``local[8,3]`` (task retries ON), optionally
injecting ONE task failure on the first attempt of partition 0 —
the claim under test is that a retried task reproduces exactly the
rows the failed attempt would have produced, because every draw is a
content-keyed hash, never rand()/Date.now().

Prints one JSON line: {"n": ..., "digest": ...} over the selected
(doc_id, split) pairs.
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    sf_dir, inject = sys.argv[1], sys.argv[2] == "inject"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8,3]")
        .appName("retry_determinism")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from gclog_parser_spark.operators.sampling import (
        hash_split,
        stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    if inject:
        # one-shot poison: first attempt of partition 0 dies AFTER
        # emitting half its rows — the retry must not double-count or
        # drop anything
        def poison(iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            bad = ctx.partitionId() == 0 and ctx.attemptNumber() == 0
            for i, pdf in enumerate(iterator):
                if bad and i == 0:
                    yield pdf.iloc[: len(pdf) // 2]
                    raise RuntimeError("injected task failure")
                yield pdf

        docs = docs.mapInPandas(poison, docs.schema)

    sel = hash_split(
        stratified_sample(docs, rates={"en": 0.5}, default_rate=0.8)
    ).select("doc_id", "split")
    rows = sorted((r["doc_id"], r["split"]) for r in sel.collect())
    import hashlib

    digest = hashlib.md5(repr(rows).encode()).hexdigest()
    print(json.dumps({"n": len(rows), "digest": digest}))
    spark.stop()


if __name__ == "__main__":
    main()
