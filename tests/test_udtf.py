"""The UDTF lane (operators/parse.py::register_block_udtf): the SQL
table function emits exactly the block stream the narrow parse
consumes."""

from __future__ import annotations

from gclog_parser_spark import core
from gclog_parser_spark.datagen import pages_from_documents
from gclog_parser_spark.operators.parse import (
    parse_events,
    register_block_udtf,
)


def test_udtf_blocks_match_scanner(spark, sf_dir):
    register_block_udtf(spark)
    pages = pages_from_documents(spark, sf_dir)
    pages.createOrReplaceTempView("pages_udtf_v")
    got = {
        (r["url"], r["line_no"], r["block"])
        for r in spark.sql(
            "SELECT p.url, s.line_no, s.block"
            " FROM pages_udtf_v p,"
            " LATERAL split_gc_blocks(p.url, p.text) s"
        ).collect()
    }
    want = set()
    for r in pages.select("url", "text").collect():
        for line_no, block in core.split_blocks_pos(r["text"], False):
            want.add((r["url"], line_no, block))
    assert got == want
    # and the stream carries every event the narrow parse extracts
    assert len(got) == parse_events(pages, stitch="narrow").count()
