"""Simulates the driver's correctness gate: run every ``queries()`` entry
on Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet
tables, compare row multisets (order-insensitive, column-name sorted).

Runs at TWO scale factors: sf0.001 (the quick lane — iterate with
``-m "not slow"``) and sf0.01 (the driver's own gate SF, marked
``slow``); the SF is in every test id so a failure names its scale."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(
    scope="module",
    params=[
        pytest.param("/root/testdata/sf0.001", id="sf0.001"),
        pytest.param(
            "/root/testdata/sf0.01",
            id="sf0.01",
            marks=pytest.mark.slow,
        ),
    ],
)
def sf_dir(request):
    """Module-local override of the session sf_dir: parity runs at
    both the quick SF and the driver's gate SF."""
    return request.param


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    return v


def _key(t):
    return tuple((x is None, str(x)) for x in t)


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_key
    )


def _duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = res.fetchall()
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_key
    )


QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert name in entry_mod.ROWS_ONLY, f"no oracle for {name}"
        rows = q(spark, sf_dir).collect()
        assert len(rows) > 0
        return
    got = _spark_rows(q(spark, sf_dir))
    want = _duck_rows(duck, sql)
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} vs oracle {len(want)}"
    )
    assert got == want, f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sink", "hour", "events"} <= set(df.columns)
