"""Compaction + sorted-layout writer (operators/layout.py): content
preservation is oracled in test_oracle_parity.py (`corpus_compact`);
here the LAYOUT properties are pinned — file counts, per-file sort
clustering, and the maxRecordsPerFile size cap."""

from __future__ import annotations

import glob
import os

from gclog_parser_spark.operators.layout import compact_table


def _files(base, lang):
    return sorted(
        glob.glob(os.path.join(base, f"lang={lang}", "*.parquet"))
    )


def test_compact_one_file_per_partition_and_sorted(spark, sf_dir, tmp_path):
    out = str(tmp_path / "compact")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compact_table(docs, out, partition_by=["lang"], sort_by=["doc_id"])

    langs = [
        r["lang"] for r in docs.select("lang").distinct().collect()
    ]
    assert langs
    for lang in langs:
        files = _files(out, lang)
        # hash-clustered on the hive key: one task -> one file per dir
        assert len(files) == 1, (lang, files)
        ids = [
            r["doc_id"] for r in spark.read.parquet(files[0]).collect()
        ]
        assert ids == sorted(ids)  # footer min/max pruning works

    got = spark.read.parquet(out)
    assert got.count() == docs.count()


def test_compact_max_records_per_file_splits(spark, sf_dir, tmp_path):
    out = str(tmp_path / "compact_small")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    compact_table(
        docs,
        out,
        partition_by=["lang"],
        sort_by=["doc_id"],
        max_records_per_file=25,
    )
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for lang, n in per_lang.items():
        files = _files(out, lang)
        assert len(files) == -(-n // 25), (lang, n, len(files))
