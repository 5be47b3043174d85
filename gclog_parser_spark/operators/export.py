"""Spark-side output formats (SURVEY.md §2.1 S3-S6).

The reference formats events driver-side, one file at a time
(output/OutputFormat.scala:9-36); here the same byte-identical lines are
produced *distributed*: one ``applyInPandas`` group per log (= url), so
a 10^12-page corpus formats in parallel and each log's header/order
semantics stay per-log exactly as the reference emits them per input
file (Main.scala:20-30 re-emits the TSV header per file).

Output is a lines DataFrame ``(url, line_no, line)`` — write it with
``df.write.partitionBy('url').text(...)`` or pipe single logs to stdout
in tests.  The formatting itself reuses ``functions.export`` — the same
pure functions the golden tests pin against the reference's
``toSeq``/graphite goldens.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gclog_parser_spark.functions.export import row_export_pairs

LINES_SCHEMA = "url string, line_no int, line string"


def _rows(pdf: pd.DataFrame):
    for rec in pdf.sort_values("event_idx").to_dict("records"):
        yield rec


def _tsv_fn(delimiter: str):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        lines = []
        for rec in _rows(pdf):
            pairs = row_export_pairs(rec)
            if not lines:
                # header from the FIRST event only
                # (output/OutputFormat.scala:12-15)
                lines.append(delimiter.join(k for k, _ in pairs))
            lines.append(delimiter.join(v for _, v in pairs))
        return pd.DataFrame(
            {
                "url": url,
                "line_no": range(len(lines)),
                "line": lines,
            }
        )

    return fn


def _graphite_fn(prefix: str):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        lines = []
        for rec in _rows(pdf):
            # epoch = time.getMillis/1000 (output/OutputFormat.scala:28);
            # event_time is stored UTC so no offset arithmetic needed
            ts = int(
                pd.Timestamp(rec["event_time"], tz="UTC").timestamp()
            )
            for name, value in row_export_pairs(rec):
                if name != "datetime":
                    lines.append(f"{prefix}.{name} {value} {ts}")
        return pd.DataFrame(
            {
                "url": url,
                "line_no": range(len(lines)),
                "line": lines,
            }
        )

    return fn


def tsv_export(events: DataFrame, delimiter: str = "\t") -> DataFrame:
    """TsvOutputFormat, distributed per log (S5)."""
    return events.groupBy("url").applyInPandas(
        _tsv_fn(delimiter), LINES_SCHEMA
    )


def graphite_export(events: DataFrame, prefix: str = "gc") -> DataFrame:
    """GraphiteOutputFormat, distributed per log (S6).  Like the
    reference (NPE at OutputFormat.scala:28), events without a timestamp
    are an error — filter them upstream or they raise here."""
    return events.groupBy("url").applyInPandas(
        _graphite_fn(prefix), LINES_SCHEMA
    )


def write_lines(lines: DataFrame, path: str, per_log: bool = False):
    """Sink the formatted lines (S3/S4 analogue: text files; a real
    graphite TCP sink would be a ``foreachBatch``/``foreachPartition``
    socket writer — same lines).

    ``per_log=True`` is the scale path: one text directory per url,
    written fully parallel.  The text datasource accepts exactly one
    data column, so ``line_no`` exists only for the in-partition sort
    and is dropped before the write.  ``per_log=False`` is a
    single-task ``coalesce(1)`` global file — test goldens and
    stdout-style dumps only, never the 100 TB path."""
    if per_log:
        lines.repartition("url").sortWithinPartitions(
            "url", "line_no"
        ).select("url", "line").write.partitionBy("url").mode(
            "overwrite"
        ).text(path)
    else:
        lines.orderBy("url", "line_no").select("line").coalesce(
            1
        ).write.mode("overwrite").text(path)
