"""Debezium/WAL envelope parsing: the quarantine paths and image-selection
rules the round-trip oracle (well-formed envelopes only) can't exercise."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.sources.debezium import (
    parse_debezium,
    to_debezium,
)

ROW = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _raw(spark, lines):
    return spark.createDataFrame(
        [(line,) for line in lines], "value string"
    )


GOOD_C = (
    '{"payload": {"op": "c", "after": {"url": "a", "value": 1.0},'
    ' "source": {"lsn": 1, "ts_ms": 1704067200000}}}'
)
GOOD_D = (
    '{"payload": {"op": "d", "before": {"url": "a", "value": 1.0},'
    ' "source": {"lsn": 2, "ts_ms": 1704067201000}}}'
)


def test_images_and_ops(spark):
    good, quar = parse_debezium(_raw(spark, [GOOD_C, GOOD_D]), ROW)
    rows = {r.lsn: r for r in good.collect()}
    assert quar.count() == 0
    assert rows[1].op == "I" and rows[1].url == "a"  # after-image
    assert rows[2].op == "D" and rows[2].url == "a"  # before-image
    # snapshot reads ('r') are upserts too
    snap = GOOD_C.replace('"op": "c"', '"op": "r"')
    g2, _ = parse_debezium(_raw(spark, [snap]), ROW)
    assert g2.collect()[0].op == "I"


def test_quarantine_reasons(spark):
    cases = [
        (None, "transport_tombstone"),                      # Kafka tombstone
        ("{not json", "unparseable_envelope"),
        ('{"payload": {"op": "x", "after": {"url": "a"},'
         ' "source": {"lsn": 1, "ts_ms": 1}}}', "unknown_op"),
        # a delete with no before-image has nothing to tombstone
        ('{"payload": {"op": "d",'
         ' "source": {"lsn": 1, "ts_ms": 1}}}', "missing_row_image"),
        ('{"payload": {"op": "c", "after": {"url": "a"},'
         ' "source": {"ts_ms": 1}}}', "missing_lsn"),
        ('{"payload": {"op": "c", "after": {"url": "a"},'
         ' "source": {"lsn": 1}}}', "missing_source_ts"),
    ]
    good, quar = parse_debezium(_raw(spark, [c for c, _ in cases]), ROW)
    assert good.count() == 0
    reasons = [r.reason for r in quar.collect()]
    assert sorted(reasons) == sorted(r for _, r in cases)


def test_roundtrip_is_identity(spark):
    import datetime

    log = spark.createDataFrame(
        [
            ("I", "a", 1.5, 10,
             datetime.datetime(2024, 1, 1, 0, 0, 1)),
            ("U", "a", 2.5, 11,
             datetime.datetime(2024, 1, 2, 3, 4, 5, 123000)),
            ("D", "b", None, 12,
             datetime.datetime(2024, 1, 3)),
        ],
        "op string, url string, value double, lsn long, warc_ts timestamp",
    )
    wire = to_debezium(log, row_cols=["url", "value"])
    good, quar = parse_debezium(wire, ROW)
    assert quar.count() == 0
    got = {
        (r.op, r.url, r.value, r.lsn, r.warc_ts) for r in good.collect()
    }
    want = {
        (r.op, r.url, r.value, r.lsn, r.warc_ts) for r in log.collect()
    }
    assert got == want
