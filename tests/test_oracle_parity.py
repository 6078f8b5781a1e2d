"""Mimics the driver's correctness gate: every queries() entry with an
oracle_sql() runs in Spark AND DuckDB on the same parquet; row counts, sorted
column names, and sorted stringified values must match exactly."""

import datetime
import decimal
import os

import duckdb
import pytest

from embulk_input_marketo_spark.plans.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    srows = sdf.collect()

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert spark_cols == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {sorted(duck_cols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row counts differ: {len(srows)} vs {len(drows)}"
    )

    s_sorted = sorted(
        tuple(_canon(r[c]) for c in spark_cols) for r in srows
    )
    didx = {c: i for i, c in enumerate(duck_cols)}
    d_sorted = sorted(
        tuple(_canon(r[didx[c]]) for c in spark_cols) for r in drows
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
