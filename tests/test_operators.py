"""Unit tests for carried-over reference semantics: coercion, null rules,
CSV parse (quote fixtures), id sanitization, window clamp, pagination
adapters, preview source."""

import pyspark.sql.functions as F

from embulk_input_marketo_spark.operators.coerce import coerce
from embulk_input_marketo_spark.operators.sanitize import (
    missing_ids,
    split_ids,
    valid_ids,
)
from embulk_input_marketo_spark.operators.windows import clamp_window
from embulk_input_marketo_spark.sources.csv_source import read_bulk_extract_csv
from embulk_input_marketo_spark.sources.paginated import (
    id_range_batches,
    page_by_offset,
    page_by_token,
    preview_rows,
)


def test_coercion_type_lattice_and_null_rules(spark):
    """The MarketoField type lattice + ''/'null' → NULL
    (AllStringJacksonServiceRecord.java:39-78)."""
    df = spark.createDataFrame(
        [
            ("19", "2017-09-08T16:39:14Z", "2017-09-08", "true", "12.5", "7", "x"),
            ("null", "", "null", "FALSE", "null", "", "null"),
        ],
        ["id", "createdAt", "birthday", "isLead", "mBtestcurrency24",
         "leadScore", "email"],
    )
    typed = coerce(
        df,
        {
            "id": "integer",
            "createdAt": "datetime",
            "birthday": "date",
            "isLead": "boolean",
            "mBtestcurrency24": "currency",
            "leadScore": "score",
            "email": "email",
        },
    )
    types = dict((f.name, f.dataType.simpleString()) for f in typed.schema.fields)
    assert types == {
        "id": "bigint", "createdAt": "timestamp", "birthday": "timestamp",
        "isLead": "boolean", "mBtestcurrency24": "double",
        "leadScore": "bigint", "email": "string",
    }
    r1, r2 = typed.orderBy(F.col("id").asc_nulls_last()).collect()
    assert r1["id"] == 19 and r1["isLead"] is True
    assert r1["createdAt"].isoformat() == "2017-09-08T16:39:14"
    assert r1["mBtestcurrency24"] == 12.5 and r1["leadScore"] == 7
    # null rules: literal 'null' and '' both → NULL across all types
    assert all(r2[c] is None for c in ["id", "createdAt", "birthday",
                                       "mBtestcurrency24", "leadScore", "email"])
    assert r2["isLead"] is False  # Boolean.parseBoolean('FALSE') → false


def test_csv_rfc4180_quotes(spark, tmp_path):
    """Quote handling the reference tests e2e (lead_extract_with_quote_
    RFC4180.csv: doubled-quote escape, embedded commas/newlines)."""
    p = tmp_path / "extract.csv"
    p.write_text(
        'id,firstName,lastName,attributes\n'
        '1,"first""Name1",lastName1,"{""Source Type"":""List import""}"\n'
        '2,"multi\nline",plain,null\n'
        '3,,"x,y",\n'
    )
    df = read_bulk_extract_csv(spark, str(p), field_types={"id": "integer"})
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["firstName"] == 'first"Name1'
    assert rows[1]["attributes"] == '{"Source Type":"List import"}'
    assert rows[2]["firstName"] == "multi\nline"
    assert rows[2]["attributes"] is None      # literal 'null' → NULL
    assert rows[3]["firstName"] is None       # unquoted empty → NULL
    assert rows[3]["lastName"] == "x,y"


def test_id_sanitization(spark):
    raw = spark.createDataFrame(
        [(" 1, 2 ,,abc, 03,",)], ["ids"]
    )
    ids = split_ids(raw, "ids")
    got = sorted(r["id"] for r in ids.collect())
    assert got == ["03", "1", "2", "abc"]
    ok = sorted(r["id"] for r in valid_ids(ids).collect())
    assert ok == ["03", "1", "2"]


def test_missing_ids_anti_join(spark):
    req = spark.createDataFrame([("1",), ("2",), ("9",)], ["id"])
    act = spark.createDataFrame([("1",), ("2",)], ["id"])
    assert [r["id"] for r in missing_ids(req, act).collect()] == ["9"]


def test_window_clamp_never_reads_future():
    # to = min(from + fetch, job-start snapshot)  (C1)
    assert clamp_window(hwm_lsn=100, fetch_span=50, max_lsn_snapshot=500) == (100, 150)
    assert clamp_window(hwm_lsn=100, fetch_span=5000, max_lsn_snapshot=500) == (100, 500)


def test_pagination_adapters(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "lsn")
    page, nxt = page_by_token(df, cursor=-1, batch_size=300)
    assert page.count() == 300 and nxt == 299
    page, nxt = page_by_token(df, cursor=899, batch_size=300)
    assert page.count() == 100 and nxt is None   # partial page → no token
    page, nxt = page_by_offset(df, offset=800, max_return=200)
    assert page.count() == 200 and nxt == 1000
    page, nxt = page_by_offset(df, offset=1000, max_return=200)
    assert page.count() == 0 and nxt is None
    ranges = id_range_batches(spark, 0, 1000, step=300).collect()
    assert [(r["range_lo"], r["range_hi"]) for r in ranges] == [
        (0, 299), (300, 599), (600, 899), (900, 999)
    ]


def test_preview_source(spark):
    df = preview_rows(spark, 15)
    assert df.count() == 15
    assert df.schema["warc_ts"].dataType.simpleString() == "timestamp"
    assert df.schema["html"].dataType.simpleString() == "binary"
