"""DuckDB oracle SQL for the driver correctness gate.

Each Spark query in ``__spark_entry__.queries()`` has an equivalent ANSI
SQL here that DuckDB runs against the same parquet tables.  The oracle
re-implements the whole pipeline — deterministic page synthesis, line
explode, window-based event grouping, regex field extraction, rates,
heap-region pairing — **in pure SQL**, so the comparison is a genuinely
independent second implementation, not a copy of expected numbers.

Everything is generated from the same single sources of truth the Spark
side uses: fixture bytes (fixtures.py), dim rows (schema.py) and the
datagen arithmetic (datagen.py), so the two sides cannot drift.

Dialect notes (verified against duckdb 1.0):
* ``strptime %g`` = milliseconds; ``//`` = integer division truncating
  toward zero (JVM/Spark ``div`` parity);
* ``regexp_*`` is RE2 — no lookbehind, so the 'bare heap delta' (the
  first ``A->B(C)`` not belonging to a ``[Name: ...`` generation,
  Parser.scala:37) is matched by requiring a non-colon before the
  preceding space;
* ``CAST(double AS BIGINT)`` rounds — ``trunc()`` first for the
  reference's ``(seconds*1000).toLong`` truncation.
"""

from __future__ import annotations

from gclog_parser_spark.fixtures import all_classes
from gclog_parser_spark.schema import COLLECTOR_FAMILY_ROWS, HEAP_REGION_ROWS

# ---------------------------------------------------------------------------
# lexical pieces (kept in lockstep with core.py)
# ---------------------------------------------------------------------------

TS = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}[+-]\d{4}"
AGE = r"\d+\.\d+"
SIZE = r"\d+[KMG]"

APPSTOP_BODY = (
    "Total time for which application threads were stopped: @AGE@ "
    "seconds, Stopping threads took:"
)
GEN_PATTERN = (
    r"\[([A-Za-z0-9 \-]+)"
    r"(\nDesired survivor size \d+ bytes, new threshold \d+ "
    r"\([^\n]*(\n- age[^\n]*)*\n)?"
    r": (@SIZE@)->(@SIZE@)\((@SIZE@)\)"
)


def _expand(sql: str) -> str:
    return (
        sql.replace("@TS@", TS).replace("@AGE@", AGE).replace("@SIZE@", SIZE)
    )


def _q(s: str) -> str:
    """SQL string literal."""
    return "'" + s.replace("'", "''") + "'"


def _b(expr: str) -> str:
    """to_bytes(expr) as SQL (SuffixExpander semantics + K/M/G ladder,
    '%' → ×1)."""
    return (
        f"(CAST(rtrim({expr}, 'KMG%') AS BIGINT) * "
        f"CASE right({expr}, 1) WHEN 'K' THEN 1024 "
        f"WHEN 'M' THEN 1048576 WHEN 'G' THEN 1073741824 ELSE 1 END)"
    )


# ---------------------------------------------------------------------------
# shared CTE prefix
# ---------------------------------------------------------------------------

def fixtures_values() -> str:
    rows = ",\n    ".join(
        f"({cid}, {_q(name)}, {_q(text)})"
        for cid, name, text, _, _ in all_classes()
    )
    return f"fixtures(class_id, class_name, fixture_text) AS (VALUES\n    {rows})"


def family_values() -> str:
    rows = ", ".join(f"({_q(t)}, {_q(f)})" for t, f in COLLECTOR_FAMILY_ROWS)
    return f"family_dim(gc_type, family) AS (VALUES {rows})"


def kind_values() -> str:
    rows = ", ".join(f"({_q(t)}, {_q(f)})" for t, f in HEAP_REGION_ROWS)
    return f"kind_dim(region_name, kind) AS (VALUES {rows})"


#: pages synthesis — mirrors datagen._page_cols arithmetic exactly
PAGES_CTE = """pages AS (
  SELECT
    'https://logs.example/' || f.class_name || '/' ||
      CAST(d.doc_id AS VARCHAR) AS url,
    TIMESTAMP '2016-11-10 00:00:00'
      + to_hours(CASE WHEN d.doc_id % 100 < 70 THEN 4
                      ELSE CAST(d.doc_id % 24 AS INT) END)
      + to_minutes(CAST(d.doc_id % 60 AS INT)) AS warc_ts,
    f.fixture_text AS gc_text
  FROM documents d
  JOIN fixtures f ON f.class_id = CAST(d.doc_id % 10 AS INT)
)"""

LINES_CTE = """lines AS (
  SELECT url, warc_ts,
         generate_subscripts(string_split(gc_text, chr(10)), 1) - 1
           AS line_no,
         unnest(string_split(gc_text, chr(10))) AS line
  FROM pages
)"""

FLAGGED_CTE = _expand(
    """flagged AS (
  SELECT *,
    (regexp_matches(line, '^(@TS@: )?@AGE@: \\[')
     OR regexp_matches(line, '^(@TS@: )?@AGE@: """
    + APPSTOP_BODY
    + """')) AS is_start
  FROM lines
)"""
)

# GcLine-mode grouping: block per start line (Parser.scala:75 semantics)
BLOCKS_CTE = """grp AS (
  SELECT *,
         sum(CASE WHEN is_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY url ORDER BY line_no) AS event_seq
  FROM flagged
),
blocks AS (
  SELECT url, warc_ts, event_seq, min(line_no) AS line_no,
         string_agg(line, chr(10) ORDER BY line_no) AS block
  FROM grp WHERE event_seq > 0
  GROUP BY url, warc_ts, event_seq
)"""

PARSED_CTE = _expand(
    """parsed AS (
  SELECT url, warc_ts, line_no,
    nullif(regexp_extract(block, '^(@TS@): ', 1), '') AS ts_str,
    CAST(regexp_extract(block, '^(?:@TS@: )?(@AGE@): ', 1) AS DOUBLE)
      AS age,
    regexp_matches(block,
      '^(?:@TS@: )?@AGE@: """
    + APPSTOP_BODY
    + """') AS is_app,
    trim(regexp_extract(block,
      '^(?:@TS@: )?@AGE@: \\[([A-Za-z\\- ]*)', 1)) AS type0,
    nullif(regexp_extract(block,
      '^(?:@TS@: )?@AGE@: \\[[A-Za-z\\- ]*\\(([A-Za-z ]+)\\)', 1), '')
      AS cause,
    regexp_matches(block,
      '^(?:@TS@: )?@AGE@: \\[[A-Za-z\\- ]*\\([A-Za-z ]+\\) *--')
      AS flag2,
    regexp_matches(block, '^(?:@TS@: )?@AGE@: \\[[A-Za-z\\- ]*\\]')
      AS cms_immediate,
    regexp_extract(block,
      '(?:^|[^:]) (@SIZE@)->(@SIZE@)\\((@SIZE@)\\)', ['hb','ha','hc'])
      AS heap,
    CAST(list_extract(regexp_extract_all(block,
      ', (@AGE@) secs\\]', 1), -1) AS DOUBLE) AS basic_pause,
    CAST(nullif(regexp_extract(block,
      ' real=(@AGE@) secs\\]', 1), '') AS DOUBLE) AS real_pause,
    regexp_extract(block, '"""
    + GEN_PATTERN
    + """',
      ['g_name','g_tn','g_agei','g_b','g_a','g_c']) AS gen1,
    CAST(length(regexp_extract_all(block, '"""
    + GEN_PATTERN
    + """')) AS INT) AS gen_count,
    regexp_extract_all(block, '"""
    + GEN_PATTERN
    + """', 1) AS gen_names,
    regexp_extract_all(block, '"""
    + GEN_PATTERN
    + """', 4) AS gen_bs,
    regexp_extract_all(block, '"""
    + GEN_PATTERN
    + """', 5) AS gen_as,
    regexp_extract_all(block, '"""
    + GEN_PATTERN
    + """', 6) AS gen_cs,
    nullif(regexp_extract(block,
      'Desired survivor size (\\d+) bytes, new threshold (\\d+)',
      ['d','t']).d, '') AS tenuring_desired,
    nullif(regexp_extract(block,
      'Desired survivor size (\\d+) bytes, new threshold (\\d+)',
      ['d','t']).t, '') AS tenuring_threshold,
    CAST(nullif(regexp_extract(block,
      'stopped: (@AGE@) seconds, Stopping', 1), '') AS DOUBLE) AS stopped,
    CAST(nullif(regexp_extract(block,
      'Stopping threads took: (@AGE@) seconds', 1), '') AS DOUBLE)
      AS to_stop
  FROM blocks
)"""
)

TYPED_CTE = """typed AS (
  SELECT *,
    CASE WHEN is_app THEN 'AppStopped'
         ELSE type0 || CASE WHEN flag2 THEN '--' ELSE '' END END
      AS gc_type,
    CASE WHEN is_app THEN 'app_stopped'
         WHEN (cause IS NULL AND type0 LIKE 'CMS%')
           OR (cause LIKE 'CMS%') THEN 'cms'
         ELSE 'basic' END AS gc_class
  FROM parsed
)"""

EVENTS_ALL_CTE = f"""events_all AS (
  SELECT url, warc_ts, line_no,
    CASE WHEN ts_str IS NOT NULL THEN
      epoch_ms(strptime(ts_str, '%Y-%m-%dT%H:%M:%S.%g%z')) END
      AS event_epoch_ms,
    CASE WHEN ts_str IS NOT NULL THEN right(ts_str, 5) END AS tz_offset,
    age AS jvm_age_seconds, gc_class, gc_type, cause AS gc_cause,
    CASE WHEN gc_class = 'basic' AND heap.hb <> ''
         THEN {_b("heap.hb")} END AS heap_before_bytes,
    CASE WHEN gc_class = 'basic' AND heap.hb <> ''
         THEN {_b("heap.ha")} END AS heap_after_bytes,
    CASE WHEN gc_class = 'basic' AND heap.hb <> ''
         THEN {_b("heap.hc")} END AS heap_max_bytes,
    CASE WHEN gc_class = 'basic' AND heap.hb <> ''
         THEN {_b("heap.hb")} - {_b("heap.ha")} END
      AS heap_reclaimed_bytes,
    CASE gc_class
      WHEN 'cms' THEN CASE WHEN cms_immediate THEN 0.0 ELSE real_pause END
      WHEN 'basic' THEN basic_pause END AS pause_seconds,
    CASE WHEN gc_class = 'basic' THEN gen_count ELSE 0 END AS gen_count,
    CASE WHEN gc_class = 'basic' THEN gen_names
         ELSE []::VARCHAR[] END AS gen_names,
    CASE WHEN gc_class = 'basic' THEN gen_bs
         ELSE []::VARCHAR[] END AS gen_bs,
    CASE WHEN gc_class = 'basic' THEN gen_as
         ELSE []::VARCHAR[] END AS gen_as,
    CASE WHEN gc_class = 'basic' THEN gen_cs
         ELSE []::VARCHAR[] END AS gen_cs,
    CASE WHEN gc_class = 'basic' AND gc_type = 'GC' AND heap.hb <> ''
              AND gen1.g_name <> '' AND lower(gen1.g_name) <> 'young'
         THEN ({_b("gen1.g_b")} - {_b("gen1.g_a")})
              - ({_b("heap.hb")} - {_b("heap.ha")}) END AS promoted_bytes,
    CASE WHEN gc_class = 'basic'
         THEN CAST(tenuring_desired AS BIGINT) END
      AS desired_survivor_size,
    CASE WHEN gc_class = 'basic'
         THEN CAST(tenuring_threshold AS INT) END AS new_threshold,
    CASE WHEN gc_class = 'app_stopped' THEN stopped END
      AS stopped_seconds,
    CASE WHEN gc_class = 'app_stopped' THEN to_stop END
      AS seconds_to_stop
  FROM typed
)"""

GC_EVENTS_CTE = """gc_events AS (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY url ORDER BY line_no) - 1
         AS INT) AS event_idx
  FROM events_all
  WHERE gc_class = 'app_stopped'
     OR (gc_class = 'cms' AND pause_seconds IS NOT NULL)
     OR (gc_class = 'basic' AND heap_before_bytes IS NOT NULL
         AND pause_seconds IS NOT NULL)
)"""

RATED_CTE = """rated AS (
  SELECT *,
    CASE WHEN gc_class = 'app_stopped' THEN 0
         WHEN prev IS NULL THEN coalesce(heap_before_bytes, 0)
         WHEN heap_before_bytes IS NOT NULL
              AND prev.heap_after IS NOT NULL
           THEN heap_before_bytes - prev.heap_after
         ELSE 0 END AS bytes_allocated_since_last,
    CASE WHEN gc_class = 'app_stopped' THEN 0
         WHEN prev IS NULL THEN age_ms
         ELSE age_ms - prev.age_ms END AS millis_since_last
  FROM (
    SELECT *,
      CAST(trunc(jvm_age_seconds * 1000) AS BIGINT) AS age_ms,
      last_value(CASE WHEN gc_class <> 'app_stopped' THEN
          struct_pack(
            age_ms := CAST(trunc(jvm_age_seconds * 1000) AS BIGINT),
            heap_after := heap_after_bytes)
        END IGNORE NULLS) OVER (
          PARTITION BY url ORDER BY event_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
    FROM gc_events)
),
rates AS (
  SELECT *,
    CASE WHEN millis_since_last = 0 THEN 0
         ELSE bytes_allocated_since_last // millis_since_last END
      AS heap_allocation_rate,
    CASE WHEN promoted_bytes IS NOT NULL AND millis_since_last <> 0
         THEN promoted_bytes // millis_since_last ELSE 0 END
      AS promotion_rate
  FROM rated
)"""

# --- heap-stats (-XX:+PrintHeapAtGC) mode ----------------------------------

HEAP_GRP_CTE = _expand(
    """hdepth AS (
  SELECT *,
    CASE WHEN line LIKE '{Heap before%' THEN 1 ELSE 0 END AS opens,
    CASE WHEN trim(line) = '}' THEN 1 ELSE 0 END AS closes
  FROM flagged
),
hdepth2 AS (
  SELECT *,
    coalesce(sum(opens - closes) OVER (
      PARTITION BY url ORDER BY line_no
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS depth
  FROM hdepth
),
hgrp AS (
  SELECT *,
    sum(CASE WHEN depth = 0 AND (opens = 1 OR is_start) THEN 1 ELSE 0 END)
      OVER (PARTITION BY url ORDER BY line_no) AS event_seq
  FROM hdepth2
)"""
)

REGION_LINES_CTE = _expand(
    """halves AS (
  SELECT *,
    max(CASE WHEN regexp_matches(line, '^.?Heap after') THEN 1 ELSE 0 END)
      OVER (PARTITION BY url, event_seq ORDER BY line_no) AS after_half
  FROM hgrp WHERE event_seq > 0
),
rl_raw AS (
  SELECT url, warc_ts, event_seq, after_half, line_no,
    regexp_extract(line,
      '^ *([A-Za-z][A-Za-z\\- ]*?) +total (@SIZE@), used (@SIZE@)',
      ['name','cap','used']) AS hs,
    regexp_extract(line,
      '^ *([a-zA-Z]+) +space +(@SIZE@), +(\\d+%) used',
      ['name','cap','used']) AS ss,
    regexp_extract(line,
      '^ *([A-Za-z][A-Za-z\\- ]*?) +used (@SIZE@), capacity (@SIZE@)',
      ['name','used','cap']) AS ms
  FROM halves WHERE depth > 0
),
region_lines AS (
  SELECT url, warc_ts, event_seq, after_half, line_no,
    CASE WHEN hs.name <> '' THEN trim(hs.name)
         WHEN ss.name <> '' THEN ss.name
         ELSE trim(ms.name) END AS region_name,
    CASE WHEN hs.name <> '' THEN hs.used
         WHEN ss.name <> '' THEN ss.used
         ELSE ms.used END AS used,
    CASE WHEN hs.name <> '' THEN hs.cap
         WHEN ss.name <> '' THEN ss.cap
         ELSE ms.cap END AS cap
  FROM rl_raw
  WHERE (hs.name <> '' OR ms.name <> ''
         OR (ss.name <> '' AND ss.name <> 'object'))
),
numbered AS (
  SELECT *, row_number() OVER (
    PARTITION BY url, event_seq, after_half ORDER BY line_no) AS rn
  FROM region_lines
),
region_deltas AS (
  SELECT b.url, b.warc_ts,
    CAST(dense_rank() OVER (PARTITION BY b.url ORDER BY b.event_seq) - 1
         AS INT) AS block_idx,
    CAST(b.rn - 1 AS INT) AS region_pos,
    b.region_name,
    b.used AS used_before, a.used AS used_after,
    b.cap AS capacity_before, a.cap AS capacity_after
  FROM numbered b
  JOIN numbered a ON a.url = b.url AND a.event_seq = b.event_seq
                 AND a.rn = b.rn AND a.after_half = 1
  WHERE b.after_half = 0
)"""
)


def with_prefix(*ctes: str, pages_cte: str = PAGES_CTE) -> str:
    parts = [fixtures_values(), pages_cte, LINES_CTE, FLAGGED_CTE]
    parts.extend(ctes)
    return "WITH " + ",\n".join(parts) + "\n"


def gcline_prefix(*extra: str, pages_cte: str = PAGES_CTE) -> str:
    """The full SQL GC parser over ``pages(url, warc_ts, gc_text)``.
    ``pages_cte`` swaps the input relation — the default synthesizes
    pages from the documents table; ``file_pages_cte`` points the SAME
    parser at raw log files via DuckDB ``read_text``."""
    return with_prefix(
        BLOCKS_CTE, PARSED_CTE, TYPED_CTE, EVENTS_ALL_CTE, GC_EVENTS_CTE,
        *extra,
        pages_cte=pages_cte,
    )


def file_pages_cte(glob: str) -> str:
    """pages CTE over raw log files (DuckDB's independent file reader);
    warc_ts is a constant — the raw-file queries aggregate by event
    content, never by crawl hour."""
    g = glob.replace("'", "''")
    return f"""pages AS (
  SELECT filename AS url,
         TIMESTAMP '2016-11-10 00:00:00' AS warc_ts,
         content AS gc_text
  FROM read_text('{g}')
)"""


def heap_prefix(*extra: str) -> str:
    return with_prefix(HEAP_GRP_CTE, REGION_LINES_CTE, *extra)


# --- export formats (TsvOutputFormat / GraphiteOutputFormat) ---------------

def _pair(n: str, v: str) -> str:
    return f"struct_pack(n := {n}, v := {v})"


def export_pairs_cte(with_rates: bool = True) -> str:
    """The ordered (name, value) export pairs of every rated event —
    the independent SQL twin of ``functions.export.row_export_pairs``
    (reference: GCEvent.toSeq, GCEvent.scala:16-21 + the per-subclass
    toExport layouts).  DuckDB's ``CAST(DOUBLE AS VARCHAR)`` is the
    same shortest-roundtrip rendering as the Python/Java side (verified
    incl. '3.62e-05' and '10000000.0' shapes)."""
    dt_local = (
        "strftime(make_timestamp((event_epoch_ms"
        " + (CASE WHEN substr(tz_offset, 1, 1) = '-' THEN -1 ELSE 1 END)"
        " * (CAST(substr(tz_offset, 2, 2) AS BIGINT) * 60"
        "    + CAST(substr(tz_offset, 4, 2) AS BIGINT)) * 60000)"
        " * 1000), '%Y-%m-%d %H:%M:%S.%g')"
    )
    gen_pairs = (
        "flatten(list_transform(list_zip(gen_names, gen_bs, gen_as,"
        " gen_cs), t -> ["
        + _pair("t[1] || 'Before'", f"CAST({_b('t[2]')} AS VARCHAR)")
        + ", "
        + _pair("t[1] || 'After'", f"CAST({_b('t[3]')} AS VARCHAR)")
        + ", "
        + _pair(
            "t[1] || 'Reclaimed'",
            f"CAST({_b('t[2]')} - {_b('t[3]')} AS VARCHAR)",
        )
        + ", "
        + _pair("t[1] || 'Max'", f"CAST({_b('t[4]')} AS VARCHAR)")
        + "]))"
    )
    rates_pairs = (
        "["
        + _pair("'heapAllocated'",
                "CAST(bytes_allocated_since_last AS VARCHAR)")
        + ", "
        + _pair("'heapAllocationRate'",
                "CAST(heap_allocation_rate AS VARCHAR)")
        + ", "
        + _pair("'promotionRate'", "CAST(promotion_rate AS VARCHAR)")
        + "]"
        if with_rates
        else "[]::STRUCT(n VARCHAR, v VARCHAR)[]"
    )
    src = "rates" if with_rates else "gc_events"
    return f"""export_pairs AS (
  SELECT url, event_idx, event_epoch_ms,
    (
      CASE WHEN event_epoch_ms IS NOT NULL
           THEN [{_pair("'datetime'", dt_local)}] ELSE [] END
      || [{_pair("'age'", "CAST(jvm_age_seconds AS VARCHAR)")},
          {_pair("'type'", "gc_type")}]
      || CASE WHEN gc_class = 'app_stopped' THEN [
           {_pair("'stoppedSeconds'", "printf('%f', stopped_seconds)")},
           {_pair("'secondsToStop'", "printf('%f', seconds_to_stop)")}]
         ELSE (
           CASE WHEN gc_cause IS NOT NULL
                THEN [{_pair("'cause'", "gc_cause")}] ELSE [] END
           || [{_pair("'pause'", "CAST(pause_seconds AS VARCHAR)")}]
           || CASE WHEN gc_class = 'basic' THEN (
            [{_pair("'heapBefore'", "CAST(heap_before_bytes AS VARCHAR)")},
             {_pair("'heapAfter'", "CAST(heap_after_bytes AS VARCHAR)")},
             {_pair("'heapReclaimed'",
                    "CAST(heap_reclaimed_bytes AS VARCHAR)")},
             {_pair("'heapMax'", "CAST(heap_max_bytes AS VARCHAR)")}]
            || {gen_pairs}
            || CASE WHEN promoted_bytes IS NOT NULL
                 THEN [{_pair("'promoted'",
                              "CAST(promoted_bytes AS VARCHAR)")}]
                 ELSE [] END
            || CASE WHEN desired_survivor_size IS NOT NULL THEN [
                 {_pair("'desiredSurvivorSize'",
                        "CAST(desired_survivor_size AS VARCHAR)")},
                 {_pair("'newThreshold'",
                        "CAST(new_threshold AS VARCHAR)")}]
               ELSE [] END
           ) ELSE [] END
         ) END
      || {rates_pairs}
    ) AS pairs
  FROM {src}
)"""


def tsv_export_sql(delimiter: str = "\t") -> str:
    """TsvOutputFormat lines (OutputFormat.scala:9-22): header row from
    the FIRST event's pair names, then one delimiter-joined value row
    per event, numbered per url."""
    d = f"chr({ord(delimiter)})"
    return gcline_prefix(RATED_CTE, export_pairs_cte()) + f"""
SELECT url, 0 AS line_no,
  list_aggregate(list_transform(pairs, p -> p.n), 'string_agg', {d})
    AS line
FROM export_pairs WHERE event_idx = 0
UNION ALL
SELECT url, event_idx + 1 AS line_no,
  list_aggregate(list_transform(pairs, p -> p.v), 'string_agg', {d})
    AS line
FROM export_pairs"""


def graphite_export_sql(prefix: str = "gc") -> str:
    """GraphiteOutputFormat lines (OutputFormat.scala:24-36): unpivot to
    '<prefix>.<name> <value> <epochSeconds>', excluding 'datetime';
    events without a timestamp are filtered upstream (the Spark query
    does the same — the reference NPEs on them).  No rates pairs: the
    contract's graphite query exports un-rated events."""
    return gcline_prefix(export_pairs_cte(with_rates=False)) + f"""
SELECT url,
  CAST(row_number() OVER (PARTITION BY url ORDER BY event_idx, pos) - 1
       AS INT) AS line_no,
  '{prefix}.' || p.n || ' ' || p.v || ' '
    || CAST(event_epoch_ms // 1000 AS VARCHAR) AS line
FROM (
  SELECT url, event_idx, event_epoch_ms,
         generate_subscripts(pairs, 1) AS pos,
         unnest(pairs) AS p
  FROM export_pairs WHERE event_epoch_ms IS NOT NULL)
WHERE p.n <> 'datetime'"""


def _fixture_values(text: str) -> str:
    """(line_no, line) VALUES list with SQL quote escaping — shared by
    the fixture-literal oracles."""
    return ",\n    ".join(
        f"({i}, '{line.replace(chr(39), chr(39) * 2)}')"
        for i, line in enumerate(text.split("\n"))
    )


def _size_bytes(field: str) -> str:
    """K/M/G multiplier SQL for a regexp struct field with 'n'/'u'."""
    return (
        f"CAST({field}['n'] AS BIGINT) * (CASE {field}['u']"
        " WHEN 'K' THEN 1024 WHEN 'M' THEN 1048576"
        " ELSE 1073741824 END)"
    )


def unified_sql(log_text: str | None = None) -> str:
    """Independent DuckDB reimplementation of the JDK 9+ unified-logging
    parse (core.parse_unified_line): the fixture lines as a VALUES
    list, fields re-derived with DuckDB regexps and list ops — no
    shared code with the Spark path beyond the input literals.
    Handles the G1 shapes plus ZGC percent-occupancy heaps (no max,
    optional generational seconds suffix) and Shenandoah phases."""
    from gclog_parser_spark.fixtures import UNIFIED_LOG

    values = _fixture_values(
        log_text if log_text is not None else UNIFIED_LOG
    )
    zheap = "\\d+[KMG]\\(\\d+%\\)->\\d+[KMG]\\(\\d+%\\)"
    return f"""
WITH raw(line_no, line) AS (VALUES
    {values}
),
m AS (
  SELECT line_no,
    regexp_extract(line,
      '^\\[(\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}}\\.\\d{{3}}[+-]\\d{{4}})\\]', 1) AS iso,
    regexp_extract(line, '\\[(\\d+\\.\\d+)s\\]', 1) AS age_s,
    regexp_extract(line, 'GC\\(\\d+\\) (.*)$', 1) AS body
  FROM raw
  WHERE regexp_matches(line,
    '^(\\[\\d{{4}}-[^\\]]+\\])?\\[\\d+\\.\\d+s\\](\\[[^\\]]+\\])*\\[gc(,marking)?\\] +GC\\(\\d+\\) ')
),
t1 AS (
  SELECT *,
    regexp_extract(body, '(\\d+\\.\\d+)ms\\s*$', 1) AS ms,
    regexp_extract(body, '(\\d+\\.\\d+)s\\s*$', 1) AS secs,
    -- strip the duration suffix (ms or generational-ZGC seconds)
    regexp_replace(body, '\\s*\\d+\\.\\d+m?s\\s*$', '') AS body2
  FROM m
),
f AS (
  SELECT line_no, iso, CAST(age_s AS DOUBLE) AS age, ms, secs,
    regexp_extract(body2, '(\\d+)([KMG])->\\d+[KMG]\\(\\d+[KMG]\\)', ['n','u']) AS hb,
    regexp_extract(body2, '\\d+[KMG]->(\\d+)([KMG])\\(\\d+[KMG]\\)', ['n','u']) AS ha,
    regexp_extract(body2, '\\d+[KMG]->\\d+[KMG]\\((\\d+)([KMG])\\)', ['n','u']) AS hm,
    regexp_matches(body2, '\\d+[KMG]->\\d+[KMG]\\(\\d+[KMG]\\)') AS has_heap,
    regexp_extract(body2, '(\\d+)([KMG])\\(\\d+%\\)->\\d+[KMG]\\(\\d+%\\)\\s*$', ['n','u']) AS zhb,
    regexp_extract(body2, '\\d+[KMG]\\(\\d+%\\)->(\\d+)([KMG])\\(\\d+%\\)\\s*$', ['n','u']) AS zha,
    regexp_matches(body2, '{zheap}\\s*$') AS has_zheap,
    regexp_extract_all(
      regexp_replace(regexp_replace(body2,
                     '\\s*\\d+[KMG]->\\d+[KMG]\\(\\d+[KMG]\\)\\s*$', ''),
                     '\\s*{zheap}\\s*$', ''),
      '\\(([^()]*(\\(\\))?)\\)', 1) AS parens,
    trim(regexp_replace(
      regexp_replace(regexp_replace(body2,
                     '\\s*\\d+[KMG]->\\d+[KMG]\\(\\d+[KMG]\\)\\s*$', ''),
                     '\\s*{zheap}\\s*$', ''),
      '\\(([^()]*(\\(\\))?)\\) *', '', 'g')) AS head
  FROM t1
),
b AS (
  SELECT *,
    CASE WHEN len(parens) > 0 THEN parens[len(parens)] END AS cause,
    CASE WHEN len(parens) > 1
         THEN head || ' (' || list_aggr(parens[1:len(parens)-1],
                                        'string_agg', ') (') || ')'
         ELSE head END AS gc_type
  FROM f
)
SELECT
  CAST(row_number() OVER (ORDER BY line_no) - 1 AS INT) AS event_idx,
  CAST(CASE WHEN iso <> '' THEN epoch_ms(strptime(iso, '%Y-%m-%dT%H:%M:%S.%g%z')) END AS BIGINT) AS event_epoch_ms,
  age AS jvm_age_seconds,
  CASE WHEN has_heap OR has_zheap THEN 'basic' ELSE 'g1' END AS gc_class,
  gc_type,
  cause AS gc_cause,
  CAST(CASE WHEN has_heap THEN {_size_bytes('hb')}
            WHEN has_zheap THEN {_size_bytes('zhb')} END AS BIGINT)
    AS heap_before_bytes,
  CAST(CASE WHEN has_heap THEN {_size_bytes('ha')}
            WHEN has_zheap THEN {_size_bytes('zha')} END AS BIGINT)
    AS heap_after_bytes,
  CAST(CASE WHEN has_heap THEN {_size_bytes('hm')} END AS BIGINT)
    AS heap_max_bytes,
  CAST(round(coalesce(try_cast(nullif(ms, '') AS DOUBLE) / 1000.0,
                      try_cast(nullif(secs, '') AS DOUBLE), 0.0)
             * 10000000) AS BIGINT) AS pause_ticks
FROM b
ORDER BY line_no
"""


def zgc_sql() -> str:
    """ZGC + Shenandoah fixture through the same independent unified
    oracle (the builder handles every unified shape)."""
    from gclog_parser_spark.fixtures import ZGC_LOG

    return unified_sql(ZGC_LOG)


def zgc_gen_sql() -> str:
    """JDK 21+ generational ZGC fixture (Minor/Major Collection start
    + percent-transition completion lines, [gc,phases] y:/O: metadata
    excluded by the tag filter) through the same independent unified
    oracle."""
    from gclog_parser_spark.fixtures import ZGC_GEN_LOG

    return unified_sql(ZGC_GEN_LOG)


def g1_legacy_sql() -> str:
    """Independent DuckDB reimplementation of the legacy G1 parse
    (core._scan_collection's G1 branches) over the G1LOG fixture
    literals: evacuation-pause tag folding, concurrent/remark phases
    with the outer ', T secs]' tail winning, cleanup/Full GC through
    the sized path."""
    from gclog_parser_spark.fixtures import G1LOG

    values = _fixture_values(G1LOG)
    return f"""
WITH raw(line_no, line) AS (VALUES
    {values}
),
m AS (
  SELECT line_no, line,
    regexp_extract(line,
      '^(\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}}\\.\\d{{3}}[+-]\\d{{4}}): ', 1) AS iso,
    CAST(regexp_extract(line, '^(?:[^ ]+: )?(\\d+\\.\\d+): \\[', 1) AS DOUBLE) AS age,
    regexp_extract(line, ': \\[([A-Za-z\\- ]+)', 1) AS rawtype,
    list_filter(
      regexp_extract_all(line, '\\(([A-Za-z][A-Za-z0-9 ]*)\\)', 1),
      x -> x NOT IN ('young', 'mixed')) AS cause_cands,
    regexp_extract_all(line,
      '\\((young|mixed|initial-mark|to-space exhausted)\\)', 1) AS tags,
    regexp_extract(line, '(\\d+)([KMG])->\\d+[KMG]\\(\\d+[KMG]\\), \\d+\\.\\d+ secs\\]',
                   ['n','u']) AS hb,
    regexp_extract(line, '\\d+[KMG]->(\\d+)([KMG])\\(\\d+[KMG]\\), \\d+\\.\\d+ secs\\]',
                   ['n','u']) AS ha,
    regexp_extract(line, '\\d+[KMG]->\\d+[KMG]\\((\\d+)([KMG])\\), \\d+\\.\\d+ secs\\]',
                   ['n','u']) AS hm,
    regexp_matches(line,
      '\\d+[KMG]->\\d+[KMG]\\(\\d+[KMG]\\), \\d+\\.\\d+ secs\\]') AS has_heap,
    regexp_extract_all(line, ', (\\d+\\.\\d+) secs\\]', 1) AS sec_tails
  FROM raw
  WHERE regexp_matches(line, '^(?:[^ ]+: )?\\d+\\.\\d+: \\[')
),
t AS (
  SELECT *,
    trim(rawtype) AS base_type,
    trim(rawtype) LIKE 'GC concurrent%' OR trim(rawtype) = 'GC remark'
      AS is_phase
  FROM m
)
SELECT
  CAST(row_number() OVER (ORDER BY line_no) - 1 AS INT) AS event_idx,
  CAST(CASE WHEN iso <> ''
    THEN epoch_ms(strptime(iso, '%Y-%m-%dT%H:%M:%S.%g%z')) END AS BIGINT)
    AS event_epoch_ms,
  age AS jvm_age_seconds,
  CASE WHEN is_phase THEN 'g1' ELSE 'basic' END AS gc_class,
  CASE WHEN len(tags) > 0
       THEN base_type || ' (' || list_aggr(tags, 'string_agg', ') (') || ')'
       ELSE base_type END AS gc_type,
  CASE WHEN len(cause_cands) > 0 THEN cause_cands[1] END AS gc_cause,
  CAST(CASE WHEN NOT is_phase AND has_heap THEN {_size_bytes('hb')}
    END AS BIGINT) AS heap_before_bytes,
  CAST(CASE WHEN NOT is_phase AND has_heap THEN {_size_bytes('ha')}
    END AS BIGINT) AS heap_after_bytes,
  CAST(CASE WHEN NOT is_phase AND has_heap THEN {_size_bytes('hm')}
    END AS BIGINT) AS heap_max_bytes,
  CAST(round(coalesce(
      try_cast(sec_tails[len(sec_tails)] AS DOUBLE), 0.0)
    * 10000000) AS BIGINT) AS pause_ticks
FROM t
ORDER BY line_no
"""


def unified_regions_sql(
    log_text: str | None = None, url: str = "uniheap://fixture/0"
) -> str:
    """Independent DuckDB reimplementation of the unified-logging
    heap-region parse (core.parse_unified_heap_line /
    operators/enrich.unified_region_deltas): fixture lines as VALUES,
    fields re-derived with DuckDB regexps, in-block order via
    row_number — no shared code with the Spark path beyond the
    input literals."""
    from gclog_parser_spark.fixtures import UNIFIED_HEAP_LOG

    values = _fixture_values(
        log_text if log_text is not None else UNIFIED_HEAP_LOG
    )
    pat = (
        r"^(\[[^\]]*\])*\[gc,heap\] GC\((\d+)\)"
        r" ([A-Za-z]+) regions: (\d+)->(\d+)(\((\d+)\))?\s*$"
    )
    return f"""
WITH raw(line_no, line) AS (VALUES
    {values}
),
r AS (
  SELECT line_no,
    CAST(regexp_extract(line, '\\[gc,heap\\] GC\\((\\d+)\\)', 1) AS INT)
      AS block_idx,
    regexp_extract(line, 'GC\\(\\d+\\) ([A-Za-z]+) regions:', 1)
      AS region_name,
    CAST(regexp_extract(line, 'regions: (\\d+)->', 1) AS INT)
      AS regions_before,
    CAST(regexp_extract(line, 'regions: \\d+->(\\d+)', 1) AS INT)
      AS regions_after,
    CASE WHEN regexp_matches(line, 'regions: \\d+->\\d+\\(\\d+\\)')
      THEN CAST(regexp_extract(line,
        'regions: \\d+->\\d+\\((\\d+)\\)', 1) AS INT)
    END AS target_regions
  FROM raw
  WHERE regexp_matches(line, '{pat}')
)
SELECT '{url}' AS url, block_idx,
  CAST(row_number() OVER (PARTITION BY block_idx ORDER BY line_no) - 1
    AS INT) AS region_pos,
  region_name, regions_before, regions_after, target_regions
FROM r
"""


_SP_PAT = (
    r'\[safepoint\] Safepoint "([A-Za-z0-9_]+)",'
    r" Time since last: (\d+) ns,"
    r" Reaching safepoint: (\d+) ns,"
    r"( Cleanup: (\d+) ns,)?"
    r" At safepoint: (\d+) ns,"
    r" Total: (\d+) ns\s*$"
)


def _safepoints_cte(log_text: str | None, url: str) -> str:
    """Shared matched-line CTE for the safepoint oracles: fixture
    lines as VALUES, fields re-derived with DuckDB (RE2) regexps —
    an independent second implementation of
    operators/enrich.parse_safepoints."""
    from gclog_parser_spark.fixtures import SAFEPOINT_LOG

    values = _fixture_values(
        log_text if log_text is not None else SAFEPOINT_LOG
    )
    return f"""
WITH raw(line_no, line) AS (VALUES
    {values}
),
sp AS (
  SELECT line_no,
    regexp_extract(line, '{_SP_PAT}', 1) AS sp_op,
    CAST(regexp_extract(line, '{_SP_PAT}', 2) AS BIGINT)
      AS since_last_ns,
    CAST(regexp_extract(line, '{_SP_PAT}', 3) AS BIGINT)
      AS reaching_ns,
    CASE WHEN regexp_extract(line, '{_SP_PAT}', 5) <> ''
      THEN CAST(regexp_extract(line, '{_SP_PAT}', 5) AS BIGINT)
    END AS cleanup_ns,
    CAST(regexp_extract(line, '{_SP_PAT}', 6) AS BIGINT)
      AS at_safepoint_ns,
    CAST(regexp_extract(line, '{_SP_PAT}', 7) AS BIGINT) AS total_ns
  FROM raw
  WHERE regexp_matches(line, '{_SP_PAT}')
)
"""


def safepoints_sql(
    log_text: str | None = None, url: str = "sp://fixture/0"
) -> str:
    """Oracle for enrich.parse_safepoints (JDK 13+ [safepoint] lines,
    optional JDK 16+ Cleanup field, truncated lines dropped)."""
    return _safepoints_cte(log_text, url) + f"""
SELECT '{url}' AS url,
  CAST(row_number() OVER (ORDER BY line_no) - 1 AS INT) AS sp_idx,
  sp_op, since_last_ns, reaching_ns, cleanup_ns, at_safepoint_ns,
  total_ns
FROM sp
"""


def safepoint_stats_sql(
    log_text: str | None = None, url: str = "sp://fixture/0"
) -> str:
    """Oracle for enrich.safepoint_stats (per-VM-op rollup, exact
    BIGINT sums/maxes)."""
    return _safepoints_cte(log_text, url) + """
SELECT sp_op,
  count(*) AS n_safepoints,
  CAST(sum(at_safepoint_ns) AS BIGINT) AS stopped_ns,
  max(reaching_ns) AS max_ttsp_ns,
  CAST(sum(coalesce(cleanup_ns, 0)) AS BIGINT) AS cleanup_ns,
  CAST(sum(total_ns) AS BIGINT) AS wall_ns
FROM sp GROUP BY sp_op
"""


_CPU_LEG = (
    r"\[Times: user=(\d+\.\d+) sys=(\d+\.\d+), real=(\d+\.\d+) secs\]"
)
_CPU_UNI = (
    r"\[gc,cpu\] GC\((\d+)\)"
    r" User=(\d+\.\d+)s Sys=(\d+\.\d+)s Real=(\d+\.\d+)s\s*$"
)


def cpu_times_sql() -> str:
    """Oracle for enrich.cpu_times: legacy [Times:] trailers + unified
    [gc,cpu] lines re-derived over the same synthesized pages with
    DuckDB regexps; exact DECIMAL(12,2) centisecond ticks and integer
    floor division for the parallelism ratio."""

    def cs(expr: str) -> str:
        return f"CAST(CAST({expr} AS DECIMAL(12,2)) * 100 AS BIGINT)"

    uni = f"regexp_matches(line, '{_CPU_UNI}')"
    pick = (
        "CASE WHEN {u} THEN regexp_extract(line, '{up}', {ug})"
        " ELSE regexp_extract(line, '{lp}', {lg}) END"
    )
    user = pick.format(u=uni, up=_CPU_UNI, ug=2, lp=_CPU_LEG, lg=1)
    sys_ = pick.format(u=uni, up=_CPU_UNI, ug=3, lp=_CPU_LEG, lg=2)
    real = pick.format(u=uni, up=_CPU_UNI, ug=4, lp=_CPU_LEG, lg=3)
    return with_prefix(f"""cpu AS (
  SELECT url,
    CASE WHEN {uni} THEN 'unified' ELSE 'legacy' END AS source,
    {cs(user)} AS user_cs,
    {cs(sys_)} AS sys_cs,
    {cs(real)} AS real_cs
  FROM lines
  WHERE regexp_matches(line, '{_CPU_LEG}') OR {uni}
)""") + """
SELECT url, source, count(*) AS n_cpu_lines,
  CAST(sum(user_cs) AS BIGINT) AS user_cs,
  CAST(sum(sys_cs) AS BIGINT) AS sys_cs,
  CAST(sum(real_cs) AS BIGINT) AS real_cs,
  CASE WHEN sum(real_cs) > 0 THEN CAST(
    (sum(user_cs) + sum(sys_cs)) * 1000 // sum(real_cs) AS BIGINT)
  END AS parallelism_millis
FROM cpu GROUP BY url, source
"""


def heap_trend_sql() -> str:
    """Oracle for rates.heap_trend: exact-integer OLS slope of
    heap_after KB over whole JVM seconds, per url, re-derived through
    the independent DuckDB parser CTEs."""
    return gcline_prefix("""pts AS (
  SELECT url,
    CAST(trunc(jvm_age_seconds * 1000) AS BIGINT) // 1000 AS x_s,
    heap_after_bytes // 1024 AS y_kb
  FROM gc_events
  WHERE heap_after_bytes IS NOT NULL AND jvm_age_seconds IS NOT NULL
)""", """sums AS (
  SELECT url, count(*) AS n_points,
    CAST(sum(x_s) AS BIGINT) AS sx,
    CAST(sum(y_kb) AS BIGINT) AS sy,
    CAST(sum(x_s * y_kb) AS BIGINT) AS sxy,
    CAST(sum(x_s * x_s) AS BIGINT) AS sxx
  FROM pts GROUP BY url
)""") + """
SELECT url, n_points,
  CASE WHEN n_points * sxx - sx * sx > 0 THEN
    round(CAST(n_points * sxy - sx * sy AS DOUBLE)
          / (n_points * sxx - sx * sx), 6)
  END AS slope_kb_per_s,
  round(CAST(sy AS DOUBLE) / n_points, 3) AS mean_heap_kb
FROM sums
"""


def fullgc_pressure_sql() -> str:
    """Oracle for rates.fullgc_pressure: lag() interarrival gaps of
    Full GC events per url in BIGINT truncated-ms ticks, min/max/mean
    gap plus Full-GCs-per-minute of the FULL-GC span (first to last
    Full GC; see the operator docstring).  Negative lag differences
    (jvm_age reset = restart boundary) are excluded from the gap
    stats, same as the operator."""
    return gcline_prefix("""fullx AS (
  SELECT url, line_no,
    CAST(trunc(jvm_age_seconds * 1000) AS BIGINT) AS age_ms
  FROM gc_events
  WHERE gc_type = 'Full GC' AND jvm_age_seconds IS NOT NULL
)""", """fgaps AS (
  SELECT url, age_ms,
    CASE WHEN age_ms - lag(age_ms)
           OVER (PARTITION BY url ORDER BY line_no) >= 0
         THEN age_ms - lag(age_ms)
           OVER (PARTITION BY url ORDER BY line_no)
    END AS gap_ms
  FROM fullx
)""") + """
SELECT url,
  count(*) AS n_full,
  count(gap_ms) AS n_gaps,
  min(gap_ms) AS min_gap_ms,
  max(gap_ms) AS max_gap_ms,
  CASE WHEN count(gap_ms) > 0 THEN
    round(CAST(sum(gap_ms) AS DOUBLE) / count(gap_ms), 6)
  END AS mean_gap_ms,
  CASE WHEN max(age_ms) - min(age_ms) > 0 THEN
    round(CAST(count(*) * 60000 AS DOUBLE)
          / (max(age_ms) - min(age_ms)), 6)
  END AS full_per_min
FROM fgaps GROUP BY url
"""


def cms_spans_sql() -> str:
    """Oracle for aggregate.cms_spans: start/completion pairing via
    lead() over (url, phase) in line order, BIGINT ms durations."""
    return gcline_prefix("""cmsx AS (
  SELECT url, line_no,
    regexp_replace(gc_type, '-start$', '') AS phase,
    gc_type LIKE '%-start' AS is_start,
    CAST(trunc(jvm_age_seconds * 1000) AS BIGINT) AS age_ms
  FROM gc_events
  WHERE gc_class = 'cms' AND gc_type LIKE 'CMS-concurrent-%'
)""", """paired AS (
  SELECT url, phase, line_no, is_start, age_ms,
    lead(is_start) OVER w AS next_is_start,
    lead(age_ms) OVER w AS next_age_ms
  FROM cmsx
  WINDOW w AS (PARTITION BY url, phase ORDER BY line_no)
)""") + """
SELECT url, phase,
  CAST(row_number() OVER (PARTITION BY url, phase ORDER BY line_no) - 1
    AS INT) AS span_idx,
  age_ms AS start_age_ms,
  next_age_ms AS end_age_ms,
  next_age_ms - age_ms AS duration_ms
FROM paired
WHERE is_start AND next_is_start = false
"""


def skew_stats_sql(top: int = 5) -> str:
    """Oracle for aggregate.skew_stats over the pages hot-hour key
    (70 % of pages land on hour 4 by construction — the skew the
    salted aggregate defuses)."""
    return with_prefix() + f"""
, counts AS (
  SELECT CAST(hour(warc_ts) AS VARCHAR) AS hour, count(*) AS n
  FROM pages GROUP BY 1
),
tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM counts)
SELECT hour, n,
  round(n / total, 6) AS share,
  round(n * n_keys / total, 6) AS skew_ratio
FROM counts, tot
ORDER BY n DESC, hour ASC LIMIT {top}"""


def hll_distinct_sql(p: int = 4) -> str:
    """Oracle for aggregate.hll_distinct over events user_id per
    event_type — re-derives the SAME md5-register HLL sketch in SQL
    (register = first p bits of md5('hll:'||value), rho = 41 -
    length(bin(next 40 bits)), exact BIGINT harmonic ticks) plus the
    exact COUNT DISTINCT the sketch approximates.  The alpha·m² bias
    constant is the repr of the identical Python double Spark embeds,
    so the one double division matches bit-for-bit."""
    from gclog_parser_spark.operators.aggregate import (
        HLL_W_BITS,
        _hll_alpha,
    )

    m = 1 << p
    alpha_m2 = repr(_hll_alpha(m) * m * m)
    wq = HLL_W_BITS // 4
    return f"""WITH vals AS (
  SELECT event_type,
    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                        1, {p // 4}) AS BIGINT) AS reg,
    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                        {p // 4 + 1}, {wq}) AS BIGINT) AS w
  FROM events WHERE user_id IS NOT NULL
),
regs AS (
  SELECT event_type, reg,
         MAX({HLL_W_BITS + 1} - length(bin(w))) AS r
  FROM vals GROUP BY 1, 2
),
sk AS (
  SELECT event_type,
    SUM((CAST(1 AS BIGINT) << ({HLL_W_BITS} - r))) AS present_ticks,
    COUNT(*) AS regs_used
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT s.event_type,
  round(CAST({alpha_m2} AS DOUBLE)
        * CAST((CAST(1 AS BIGINT) << {HLL_W_BITS}) AS DOUBLE)
        / CAST(present_ticks
               + ({m} - regs_used)
                 * (CAST(1 AS BIGINT) << {HLL_W_BITS}) AS DOUBLE),
        4) AS est_distinct,
  CAST(regs_used AS INT) AS regs_used,
  e.exact_distinct
FROM sk s JOIN exact e USING (event_type)"""


def hll_rollup_sql(p: int = 4) -> str:
    """Oracle for the HLL sketch-hierarchy rollup query: per-type and
    global distinct-user estimates.  Register max is associative, so
    the oracle derives each level's registers directly from the
    values — by construction the same bits Spark gets by merging the
    finer (event_type, hour) register relation — and emits the one
    estimate as BOTH est_merged and est_direct (the Spark side
    computes the two columns along the two different paths; equality
    IS the rollup property under test)."""
    from gclog_parser_spark.operators.aggregate import (
        HLL_W_BITS,
        _hll_alpha,
    )

    m = 1 << p
    alpha_m2 = repr(_hll_alpha(m) * m * m)
    wq = HLL_W_BITS // 4
    est = (
        f"round(CAST({alpha_m2} AS DOUBLE)"
        f" * CAST((CAST(1 AS BIGINT) << {HLL_W_BITS}) AS DOUBLE)"
        f" / CAST(present_ticks + ({m} - regs_used)"
        f" * (CAST(1 AS BIGINT) << {HLL_W_BITS}) AS DOUBLE), 4)"
    )
    ticks = f"SUM((CAST(1 AS BIGINT) << ({HLL_W_BITS} - r)))"
    return f"""WITH vals AS (
  SELECT event_type,
    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                        1, {p // 4}) AS BIGINT) AS reg,
    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                        {p // 4 + 1}, {wq}) AS BIGINT) AS w
  FROM events WHERE user_id IS NOT NULL
),
regs_t AS (
  SELECT event_type, reg,
         MAX({HLL_W_BITS + 1} - length(bin(w))) AS r
  FROM vals GROUP BY 1, 2
),
regs_g AS (SELECT reg, MAX(r) AS r FROM regs_t GROUP BY 1),
sk_t AS (
  SELECT event_type, {ticks} AS present_ticks,
         COUNT(*) AS regs_used
  FROM regs_t GROUP BY 1
),
sk_g AS (
  SELECT {ticks} AS present_ticks, COUNT(*) AS regs_used FROM regs_g
)
SELECT 'event_type' AS level, event_type,
  {est} AS est_merged, {est} AS est_direct,
  CAST(regs_used AS INT) AS regs_used
FROM sk_t
UNION ALL
SELECT 'global', CAST(NULL AS VARCHAR),
  {est}, {est}, CAST(regs_used AS INT)
FROM sk_g"""


def resample_ffill_sql(user_mod: int = 10) -> str:
    """Oracle for temporal.resample_ffill over events (hourly grid per
    user, forward-filled value, same (epoch-micros, event_id) string
    arg-max tie rule)."""
    k = (
        "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
        "lpad(CAST(event_id AS VARCHAR), 12, '0')"
    )
    return f"""WITH src AS (
  SELECT * FROM events WHERE user_id % {user_mod} = 0
),
obs AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         arg_max(value, {k}) AS obs
  FROM src GROUP BY 1, 2
),
bounds AS (
  SELECT user_id,
         min(date_trunc('hour', ts)) AS lo,
         max(date_trunc('hour', ts)) AS hi
  FROM src GROUP BY 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT g.user_id, g.bucket,
  last_value(o.obs IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
  o.obs IS NOT NULL AS is_observed
FROM grid g LEFT JOIN obs o
  ON g.user_id = o.user_id AND g.bucket = o.bucket"""


def dq_audit_sql() -> str:
    """Oracle for the dq_audit contract query — every check re-derived
    as an independent scalar subquery, one UNION ALL per check."""
    return """SELECT 'o_orderkey_unique' AS check,
  CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
    AS BIGINT) AS violations
UNION ALL SELECT 'o_custkey_fk',
  CAST((SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL SELECT 'l_orderkey_fk',
  CAST((SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL SELECT 'user_id_not_null',
  CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT)
UNION ALL SELECT 'value_range',
  CAST((SELECT count(*) FROM events
        WHERE value IS NOT NULL
          AND (value < 0 OR value >= 1000000000)) AS BIGINT)
UNION ALL SELECT 'orders_without_lineitem',
  CAST((SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT)"""


def mad_anomalies_sql(k: float = 3.0, mad_floor: float = 1.0) -> str:
    """Oracle for the hot-hour anomaly flags: per-hour page counts,
    median/MAD re-derived with quantile_cont over explicit DOUBLE
    casts (DuckDB's median does not interpolate DECIMAL inputs)."""
    return with_prefix() + f"""
, counts AS (
  SELECT CAST(hour(warc_ts) AS INT) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM pages GROUP BY 1
),
med AS (
  SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS med FROM counts
),
mad AS (
  SELECT quantile_cont(CAST(abs(n - med) AS DOUBLE), 0.5) AS mad
  FROM counts, med
)
SELECT c.hour, c.n, med.med, mad.mad,
       c.n > med.med + {k} * greatest(mad.mad, {mad_floor}) AS is_anomaly
FROM counts c, med, mad"""


def cms_freq_sql(
    depth: int = 4, width: int = 512, probe_mod: int = 15
) -> str:
    """Oracle for the Count-Min frequency estimates over events
    user_id — identical salted-md5 buckets, min-over-rows estimate,
    joined with the exact counts the sketch over-approximates."""
    h = (
        "CAST('0x' || substr(md5('cms' || CAST({j} AS VARCHAR) || ':'"
        " || CAST({v} AS VARCHAR)), 1, 15) AS BIGINT) % {w}"
    )
    return f"""WITH rows_ AS (
  SELECT unnest(generate_series(0, {depth - 1})) AS j
),
counters AS (
  SELECT r.j AS row_idx,
         {h.format(j='r.j', v='e.user_id', w=width)} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events e, rows_ r WHERE e.user_id IS NOT NULL
  GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {probe_mod} = 0
),
pb AS (
  SELECT p.user_id, r.j,
         {h.format(j='r.j', v='p.user_id', w=width)} AS bucket
  FROM probes p, rows_ r
),
est AS (
  SELECT pb.user_id, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
  FROM pb LEFT JOIN counters c
    ON c.row_idx = pb.j AND c.bucket = pb.bucket
  GROUP BY 1
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
  FROM events GROUP BY 1
)
SELECT e.user_id, e.est, x.exact_n
FROM est e JOIN exact x USING (user_id)"""


def journey_paths_sql(
    gap_minutes: int = 30, max_steps: int = 5, k: int = 20
) -> str:
    """Oracle for the top-k journey paths — independent gaps-and-
    islands (lag + running sum) + ordered string_agg + window-rank
    top-k with the same (count DESC, path) total order."""
    return f"""WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
              > {gap_minutes * 60} * 1000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
steps AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, sid ORDER BY ts, event_id) AS step
  FROM sess
),
paths AS (
  SELECT user_id, sid,
    string_agg(event_type, '>' ORDER BY step) AS path
  FROM steps WHERE step <= {max_steps}
  GROUP BY 1, 2
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY 1
)
SELECT path, n_sessions FROM (
  SELECT *, row_number() OVER (
    ORDER BY n_sessions DESC, path) AS r
  FROM counted
) WHERE r <= {k}"""


def decayed_counts_sql() -> str:
    """Oracle for the trending counts — same power-of-two tick decay
    (exact BIGINT), same max-date anchor."""
    return """WITH anchor AS (
  SELECT max(CAST(ts AS DATE)) AS a FROM events
),
aged AS (
  SELECT event_type,
    least(datediff('day', CAST(ts AS DATE), anchor.a), 40) AS age
  FROM events, anchor
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(CAST(1 AS BIGINT) << (40 - age)) AS BIGINT)
    AS decayed_ticks,
  round(SUM(CAST(1 AS BIGINT) << (40 - age))
        / CAST((CAST(1 AS BIGINT) << 40) AS DOUBLE), 6)
    AS trend_score
FROM aged GROUP BY 1"""


def grok_access_sql() -> str:
    """Oracle for the grok round-trip: builds the SAME synthetic
    access-log lines and extracts with the SAME compiled regex via
    DuckDB's RE2 — two regex engines, one pattern, value-equal typed
    fields."""
    from gclog_parser_spark.functions.grok import (
        ACCESS_PATTERN,
        grok_compile,
    )

    regex, fields = grok_compile(ACCESS_PATTERN)
    r = regex.replace("'", "''")
    casts = {
        "bigint": "CAST(regexp_extract(line, '{r}', {i}) AS BIGINT)",
        "timestamp": "CAST(regexp_extract(line, '{r}', {i}) AS TIMESTAMP)",
        "string": "regexp_extract(line, '{r}', {i})",
    }
    sel = ",\n  ".join(
        casts[t].format(r=r, i=i + 1) + f" AS {n}"
        for i, (n, t) in enumerate(fields)
    )
    return f"""WITH lines AS (
  SELECT CAST(user_id AS VARCHAR) || ' - ' || event_type || ' ['
         || strftime(ts, '%Y-%m-%d %H:%M:%S') || '] "GET /api/'
         || event_type || '" '
         || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
         AS line
  FROM events
)
SELECT
  {sel}
FROM lines WHERE regexp_matches(line, '{r}')"""


def stream_late_sql(delay_ms: int = 3 * 86400 * 1000) -> str:
    """Oracle for rel_stream_late: re-derives the 4-weekly-batch /
    2-batch-late-straggler arrival plan, then models Spark's
    watermark mechanics exactly (validated against the engine):

    * late-events watermark of batch b = max event time through batch
      b-2 (ms-floored; epoch_ms truncates like Spark's us/1000) minus
      the delay — one batch BEHIND the eviction watermark;
    * a row is dropped iff its hour-window end <= that watermark;
    * an hour is emitted iff its end <= the final watermark
      (global max - delay, the trailing no-data flush batch).

    The window over batch_max uses ROWS ... 2 PRECEDING to express
    the one-batch lag; NULL (batches 0/1) means the initial watermark
    where nothing drops."""
    return f"""WITH arr AS (
  SELECT ts,
    CASE WHEN event_id % 7 = 0
         THEN least(CAST(floor((day(ts)-1)/7) AS BIGINT) + 2, 3)
         ELSE least(CAST(floor((day(ts)-1)/7) AS BIGINT), 3)
    END AS b
  FROM events
),
batch_max AS (SELECT b, max(epoch_ms(ts)) AS mx FROM arr GROUP BY b),
wm AS (
  SELECT b,
    max(mx) OVER (ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
      - {delay_ms} AS late_wm
  FROM batch_max
),
fin AS (SELECT max(mx) - {delay_ms} AS final_wm FROM batch_max),
kept AS (
  SELECT date_trunc('hour', a.ts) AS hour
  FROM arr a JOIN wm USING (b)
  WHERE wm.late_wm IS NULL
     OR epoch_ms(date_trunc('hour', a.ts)) + 3600000 > wm.late_wm
),
s AS (SELECT hour, count(*) AS n_stream FROM kept GROUP BY 1),
t AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_true
  FROM events GROUP BY 1
)
SELECT t.hour,
  CAST(coalesce(s.n_stream, 0) AS BIGINT) AS n_stream,
  CAST(t.n_true AS BIGINT) AS n_true,
  CAST(t.n_true - coalesce(s.n_stream, 0) AS BIGINT) AS n_late_dropped
FROM t LEFT JOIN s USING (hour), fin
WHERE epoch_ms(t.hour) + 3600000 <= fin.final_wm"""


_STALL_PAT = (
    r"\[gc\] (Allocation|Relocation) Stall"
    r" \(([^)]+)\) (\d+\.\d{3})ms\s*$"
)


def _stalls_cte(log_text: str | None, url: str) -> str:
    """Shared matched-line CTE for the ZGC stall oracles: fixture
    lines as VALUES, fields re-derived with DuckDB (RE2) regexps and
    an exact DECIMAL(12,3) microsecond cast — an independent second
    implementation of operators/enrich.parse_gc_stalls."""
    from gclog_parser_spark.fixtures import ZGC_STALL_LOG

    values = _fixture_values(
        log_text if log_text is not None else ZGC_STALL_LOG
    )
    return f"""
WITH raw(line_no, line) AS (VALUES
    {values}
),
st AS (
  SELECT line_no,
    lower(regexp_extract(line, '{_STALL_PAT}', 1)) AS stall_kind,
    regexp_extract(line, '{_STALL_PAT}', 2) AS thread,
    CAST(CAST(regexp_extract(line, '{_STALL_PAT}', 3)
      AS DECIMAL(12,3)) * 1000 AS BIGINT) AS stall_us
  FROM raw
  WHERE regexp_matches(line, '{_STALL_PAT}')
)
"""


def gc_stalls_sql(
    log_text: str | None = None, url: str = "zstall://fixture/0"
) -> str:
    """Oracle for enrich.parse_gc_stalls (ZGC allocation/relocation
    stall lines; truncated stall lines dropped by the anchor)."""
    return _stalls_cte(log_text, url) + f"""
SELECT '{url}' AS url, line_no, stall_kind, thread, stall_us
FROM st
"""


def gc_stall_stats_sql(
    log_text: str | None = None, url: str = "zstall://fixture/0"
) -> str:
    """Oracle for enrich.gc_stall_stats (per-(url, kind) rollup,
    exact BIGINT sums/maxes)."""
    return _stalls_cte(log_text, url) + f"""
SELECT '{url}' AS url, stall_kind,
  count(*) AS n_stalls,
  CAST(count(DISTINCT thread) AS BIGINT) AS n_threads,
  CAST(sum(stall_us) AS BIGINT) AS stalled_us,
  max(stall_us) AS max_stall_us
FROM st GROUP BY stall_kind
"""


def gc_overhead_sql() -> str:
    """Oracle for rates.gc_overhead: 0.1 µs pause ticks + truncated-ms
    span over all aged events, one IEEE division for the pct."""
    return gcline_prefix("""ovx AS (
  SELECT url,
    CAST(trunc(jvm_age_seconds * 1000) AS BIGINT) AS age_ms,
    CAST(round(pause_seconds * 10000000) AS BIGINT) AS pause_ticks
  FROM gc_events
  WHERE jvm_age_seconds IS NOT NULL
)""") + """
SELECT url,
  count(pause_ticks) AS n_pauses,
  CAST(coalesce(sum(pause_ticks), 0) AS BIGINT) AS pause_ticks_sum,
  max(age_ms) - min(age_ms) AS span_ms,
  CASE WHEN max(age_ms) - min(age_ms) > 0 AND count(pause_ticks) > 0
  THEN round(CAST(sum(pause_ticks) AS DOUBLE)
             / ((max(age_ms) - min(age_ms)) * 100), 6)
  END AS overhead_pct
FROM ovx GROUP BY url
"""


_EVAC_LEG_PAT = (
    r"(\d+\.\d+): \[GC pause \([^)]*\)"
    r" \((?:young|mixed)\) \(to-space exhausted\)"
)
_EVAC_UNI_PAT = (
    r"\[(\d+\.\d+)s\]\[info\]\[gc\]"
    r" GC\((\d+)\) To-space exhausted\s*$"
)


def g1_evac_failures_sql(
    log_text: str | None = None, url: str = "g1evac://fixture/0"
) -> str:
    """Oracle for enrich.g1_evac_failures: both dialects re-derived
    with DuckDB regexps over the fixture VALUES, trunc-ms age."""
    from gclog_parser_spark.fixtures import G1_EVAC_LOG

    values = _fixture_values(
        log_text if log_text is not None else G1_EVAC_LOG
    )
    return f"""
WITH raw(line_no, line) AS (VALUES
    {values}
),
ev AS (
  SELECT line_no,
    regexp_matches(line, '{_EVAC_UNI_PAT}') AS is_uni,
    line
  FROM raw
  WHERE regexp_matches(line, '{_EVAC_LEG_PAT}')
     OR regexp_matches(line, '{_EVAC_UNI_PAT}')
)
SELECT '{url}' AS url, line_no,
  CASE WHEN is_uni THEN 'unified' ELSE 'legacy' END AS source,
  CASE WHEN is_uni
    THEN CAST(regexp_extract(line, '{_EVAC_UNI_PAT}', 2) AS INT)
  END AS gc_id,
  CAST(trunc(CAST(CASE WHEN is_uni
      THEN regexp_extract(line, '{_EVAC_UNI_PAT}', 1)
      ELSE regexp_extract(line, '{_EVAC_LEG_PAT}', 1) END
    AS DOUBLE) * 1000) AS BIGINT) AS age_ms
FROM ev
"""


_HUM_LEG_PAT = (
    r"(\d+\.\d+): \[GC pause \(G1 Humongous Allocation\)"
    r" \((?:young|mixed)\)"
)
_HUM_UNI_PAT = (
    r"\[(\d+\.\d+)s\]\[info\]\[gc\] GC\((\d+)\) Pause Young"
    r" \([^)]+\) \(G1 Humongous Allocation\)"
)
_HUM_REG_PAT = (
    r"\[(\d+\.\d+)s\]\[info\]\[gc,heap\] GC\((\d+)\)"
    r" Humongous regions: (\d+)->(\d+)\s*$"
)
_HUM_SZ_PAT = (
    r"\[\d+\.\d+s\]\[info\]\[gc,init\]"
    r" Heap [Rr]egion [Ss]ize: (\d+)M\s*$"
)


def _g1_humongous_cte(log_text: str | None, url: str) -> str:
    """Shared matched-lines CTE for the humongous oracles: both pause
    dialects + region accounting + the gc,init region-size line,
    re-derived with DuckDB regexps over the fixture VALUES."""
    from gclog_parser_spark.fixtures import G1_HUMONGOUS_LOG

    values = _fixture_values(
        log_text if log_text is not None else G1_HUMONGOUS_LOG
    )
    return f"""raw(line_no, line) AS (VALUES
    {values}
),
ev AS (
  SELECT line_no, line,
    regexp_matches(line, '{_HUM_UNI_PAT}') AS is_uni,
    regexp_matches(line, '{_HUM_REG_PAT}') AS is_reg,
    regexp_matches(line, '{_HUM_SZ_PAT}') AS is_sz
  FROM raw
  WHERE regexp_matches(line, '{_HUM_LEG_PAT}')
     OR regexp_matches(line, '{_HUM_UNI_PAT}')
     OR regexp_matches(line, '{_HUM_REG_PAT}')
     OR regexp_matches(line, '{_HUM_SZ_PAT}')
),
typed AS (
  SELECT '{url}' AS url, line_no,
    CASE WHEN is_reg OR is_sz OR is_uni THEN 'unified'
         ELSE 'legacy' END AS source,
    CASE WHEN is_reg THEN 'regions'
         WHEN is_sz THEN 'region_size'
         ELSE 'alloc_pause' END AS kind,
    CASE WHEN is_reg
           THEN CAST(regexp_extract(line, '{_HUM_REG_PAT}', 2) AS INT)
         WHEN is_uni
           THEN CAST(regexp_extract(line, '{_HUM_UNI_PAT}', 2) AS INT)
    END AS gc_id,
    CASE WHEN is_sz THEN CAST(NULL AS BIGINT)
         ELSE CAST(trunc(CAST(
             CASE WHEN is_reg
               THEN regexp_extract(line, '{_HUM_REG_PAT}', 1)
             WHEN is_uni
               THEN regexp_extract(line, '{_HUM_UNI_PAT}', 1)
             ELSE regexp_extract(line, '{_HUM_LEG_PAT}', 1) END
           AS DOUBLE) * 1000) AS BIGINT)
    END AS age_ms,
    CASE WHEN is_reg
      THEN CAST(regexp_extract(line, '{_HUM_REG_PAT}', 3) AS INT)
    END AS regions_before,
    CASE WHEN is_reg
      THEN CAST(regexp_extract(line, '{_HUM_REG_PAT}', 4) AS INT)
    END AS regions_after,
    CASE WHEN is_sz
      THEN CAST(regexp_extract(line, '{_HUM_SZ_PAT}', 1) AS INT)
    END AS region_mb
  FROM ev
)"""


def g1_humongous_sql(
    log_text: str | None = None, url: str = "g1hum://fixture/0"
) -> str:
    """Oracle for enrich.g1_humongous: one typed row per matched line."""
    return f"""
WITH {_g1_humongous_cte(log_text, url)}
SELECT url, line_no, source, kind, gc_id, age_ms,
  regions_before, regions_after, region_mb
FROM typed
"""


def g1_humongous_stats_sql(
    log_text: str | None = None, url: str = "g1hum://fixture/0"
) -> str:
    """Oracle for enrich.g1_humongous_stats: per-JVM counts, peak,
    positive-delta reclaimed regions, and bytes via the region size."""
    return f"""
WITH {_g1_humongous_cte(log_text, url)}
SELECT url,
  CAST(sum(CASE WHEN kind = 'alloc_pause' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_alloc_pauses,
  CAST(sum(CASE WHEN kind = 'regions' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_region_lines,
  max(regions_before) AS peak_regions,
  CAST(sum(CASE WHEN kind = 'regions'
        THEN greatest(regions_before - regions_after, 0) END)
    AS BIGINT) AS regions_reclaimed,
  CAST(sum(CASE WHEN kind = 'regions'
        THEN greatest(regions_before - regions_after, 0) END)
    AS BIGINT) * max(region_mb) * 1048576 AS reclaimed_bytes
FROM typed
GROUP BY url
"""


def pause_cusum_sql(target_ms: int = 100, threshold_ms: int = 500) -> str:
    """Oracle for rates.pause_cusum: the same prefix identity
    S_i = P_i − min(0, min_{j≤i} P_j) as two SQL windows over exact
    0.1 µs ticks."""
    tt = target_ms * 10_000
    th = threshold_ms * 10_000
    return gcline_prefix(f"""pauses AS (
  SELECT url, event_idx,
    CAST(round(pause_seconds * 10000000) AS BIGINT) AS pause_ticks
  FROM gc_events
  WHERE pause_seconds IS NOT NULL
),
pfx AS (
  SELECT url, event_idx, pause_ticks,
    sum(pause_ticks - {tt}) OVER (
      PARTITION BY url ORDER BY event_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM pauses
)""") + f"""
SELECT url, event_idx, pause_ticks,
  p - least(CAST(0 AS BIGINT), min(p) OVER (
      PARTITION BY url ORDER BY event_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    AS cusum_ticks,
  (p - least(CAST(0 AS BIGINT), min(p) OVER (
      PARTITION BY url ORDER BY event_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) >= {th}
    AS alarm
FROM pfx
"""


def slo_burn_sql(
    short_s: int = 60,
    long_s: int = 300,
    slo: float = 0.01,
    burn_threshold: float = 1.0,
) -> str:
    """Oracle for rates.slo_burn: the same restart-run split, fixed
    age buckets, exact-BIGINT tick sums, and one-IEEE-division burn
    rates re-derived as SQL windows (nesting long bucket = s_bucket
    floor-div k, valid because age_ms >= 0)."""
    k = long_s // short_s
    den_short = int(short_s * 10_000_000 * slo)
    den_long = int(long_s * 10_000_000 * slo)
    return gcline_prefix(f"""pauses AS (
  SELECT url, event_idx,
    CAST(trunc(jvm_age_seconds * 1000) AS BIGINT) AS age_ms,
    CAST(round(pause_seconds * 10000000) AS BIGINT) AS pause_ticks
  FROM gc_events
  WHERE pause_seconds IS NOT NULL AND jvm_age_seconds IS NOT NULL
),
slo_flagged AS (
  SELECT url, event_idx, age_ms, pause_ticks,
    CASE WHEN age_ms < lag(age_ms) OVER (
          PARTITION BY url ORDER BY event_idx)
        THEN 1 ELSE 0 END AS is_reset
  FROM pauses
),
runs AS (
  SELECT url, age_ms, pause_ticks,
    sum(is_reset) OVER (
      PARTITION BY url ORDER BY event_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM slo_flagged
),
short AS (
  SELECT url, run_id, age_ms // {short_s * 1000} AS s_bucket,
    CAST(sum(pause_ticks) AS BIGINT) AS ticks_short
  FROM runs GROUP BY url, run_id, s_bucket
),
wide AS (
  SELECT url, run_id, s_bucket, ticks_short,
    CAST(sum(ticks_short) OVER (
      PARTITION BY url, run_id, s_bucket // {k}) AS BIGINT)
      AS ticks_long
  FROM short
)""") + f"""
SELECT url, CAST(run_id AS BIGINT) AS run_id,
  s_bucket * {short_s} AS win_start_s,
  ticks_short, ticks_long,
  round(ticks_short / {den_short}, 6) AS burn_short,
  round(ticks_long / {den_long}, 6) AS burn_long,
  (round(ticks_short / {den_short}, 6) >= {burn_threshold}
   AND round(ticks_long / {den_long}, 6) >= {burn_threshold}) AS alarm
FROM wide
"""


_CYCLE_PAT = (
    r"\[gc\] GC\((\d+)\) (Major|Minor|Garbage) Collection"
    r" \(([^)]+)\) (\S+)->(\S+)( (\d+\.\d{3})s)?\s*$"
)


def stall_rootcause_sql(
    log_text: str | None = None, url: str = "zstall://fixture/0"
) -> str:
    """Oracle for enrich.stall_rootcause: same stall/cycle regexes but
    the as-of is a correlated max-line_no subquery + join — an
    independent mechanism vs the Spark side's carry-forward window."""
    return _stalls_cte(log_text, url) + f""",
c AS (
  SELECT line_no,
    CAST(regexp_extract(line, '{_CYCLE_PAT}', 1) AS BIGINT) AS gc_id,
    regexp_extract(line, '{_CYCLE_PAT}', 2) AS cycle_kind,
    regexp_extract(line, '{_CYCLE_PAT}', 3) AS gc_cause,
    CAST(CAST(NULLIF(regexp_extract(line, '{_CYCLE_PAT}', 7), '')
      AS DECIMAL(12,3)) * 1000000 AS BIGINT) AS cycle_us
  FROM raw
  WHERE regexp_matches(line, '{_CYCLE_PAT}')
)
SELECT '{url}' AS url, st.line_no, st.stall_kind, st.thread, st.stall_us,
  c.gc_id, c.cycle_kind, c.gc_cause,
  c.line_no AS cycle_line_no,
  st.line_no - c.line_no AS lines_since,
  c.cycle_us
FROM st LEFT JOIN c
  ON c.line_no = (SELECT max(c2.line_no) FROM c c2
                  WHERE c2.line_no < st.line_no)
"""


def fleet_scorecard_sql() -> str:
    """Oracle for rates.fleet_scorecard: the four signal oracles
    composed as nested-WITH CTEs (each already an independent
    implementation) + the same top-down severity CASE."""
    return f"""WITH ov AS ({gc_overhead_sql()}),
pr AS ({fullgc_pressure_sql()}),
ht AS ({heap_trend_sql()}),
cu AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_drift_alarms
  FROM ({pause_cusum_sql()}) WHERE alarm GROUP BY 1
),
sl AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_slo_pages
  FROM ({slo_burn_sql()}) WHERE alarm GROUP BY 1
),
j AS (
  SELECT ov.url, ov.n_pauses, ov.overhead_pct,
    CAST(coalesce(pr.n_full, 0) AS BIGINT) AS n_full,
    pr.full_per_min,
    ht.slope_kb_per_s,
    CAST(coalesce(cu.n_drift_alarms, 0) AS BIGINT) AS n_drift_alarms,
    CAST(coalesce(sl.n_slo_pages, 0) AS BIGINT) AS n_slo_pages
  FROM ov
  LEFT JOIN pr USING (url)
  LEFT JOIN ht USING (url)
  LEFT JOIN cu USING (url)
  LEFT JOIN sl USING (url)
)
SELECT *,
  CASE WHEN n_slo_pages > 0 THEN 'page'
       WHEN full_per_min >= 6.0 THEN 'thrash'
       WHEN n_drift_alarms > 0 THEN 'drift'
       WHEN overhead_pct >= 1.0 THEN 'watch'
       ELSE 'healthy' END AS verdict
FROM j"""


def pause_jitter_sql() -> str:
    """Oracle for rates.pause_jitter: same exact-tick Σx/Σx² rational
    variance, same two-division order and single sqrt."""
    return gcline_prefix("""jx AS (
  SELECT url, CAST(round(pause_seconds * 10000000) AS BIGINT) AS t
  FROM gc_events WHERE pause_seconds IS NOT NULL
),
ja AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_pauses,
    CAST(sum(t) AS BIGINT) AS sx,
    CAST(sum(t * t) AS BIGINT) AS sxx
  FROM jx GROUP BY url
)""") + """
SELECT url, n_pauses,
  round(sx / (n_pauses * 10000), 6) AS mean_pause_ms,
  CASE WHEN n_pauses > 1 THEN
    round((n_pauses * sxx - sx * sx) / (n_pauses * (n_pauses - 1))
          / 100000000, 6) END AS var_pause_ms2,
  CASE WHEN n_pauses > 1 THEN
    round(sqrt((n_pauses * sxx - sx * sx)
               / (n_pauses * (n_pauses - 1)) / 100000000), 6)
  END AS stddev_pause_ms
FROM ja
"""
