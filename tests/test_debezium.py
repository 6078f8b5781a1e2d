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


def test_schema_drift_discovery_and_reconcile(spark, tmp_path):
    """The north-star mid-stream evolution flow end-to-end: a `lang` column
    appears in the WAL at lsn 3 — the log IS the describe endpoint."""
    import datetime

    from pyspark.sql import Row

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.merge import merge_batch
    from embulk_input_marketo_spark.registry import SchemaRegistry
    from embulk_input_marketo_spark.sources.debezium import (
        discover_schema_drift,
        drift_to_registry_entries,
    )

    lines = [
        '{"payload": {"op": "c", "after": {"url": "a", "value": 1.5},'
        ' "source": {"lsn": 1, "ts_ms": 1704067200000}}}',
        '{"payload": {"op": "c", "after": {"url": "b", "value": 2.5},'
        ' "source": {"lsn": 2, "ts_ms": 1704067201000}}}',
        # lsn 3: the producer starts sending lang (and a long hit_count)
        '{"payload": {"op": "c", "after": {"url": "c", "value": 3.5,'
        ' "lang": "en", "hit_count": 7},'
        ' "source": {"lsn": 3, "ts_ms": 1704067202000}}}',
        '{"payload": {"op": "u", "after": {"url": "a", "value": 9.5,'
        ' "lang": "de", "hit_count": 9},'
        ' "source": {"lsn": 4, "ts_ms": 1704067203000}}}',
    ]
    raw = _raw(spark, lines)
    known = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    drift = {
        r.field_name: (r.field_type, r.first_lsn, r.n_seen)
        for r in discover_schema_drift(raw, known).collect()
    }
    assert drift == {
        "lang": ("string", 3, 2),
        "hit_count": ("long", 3, 2),
    }

    # bridge into the SAME registry/reconcile path out-of-band schemas use
    table = LakeTable.create(
        str(tmp_path / "t"), known, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    entries = drift_to_registry_entries(
        discover_schema_drift(raw, known).collect(), base_version=0
    )
    SchemaRegistry(entries).reconcile(table, up_to_lsn=4)
    evolved = table.manifest().current_schema()
    assert "lang" in evolved.names and "hit_count" in evolved.names

    # re-parse with the evolved row schema and merge: pre-drift rows read
    # NULL lang, post-drift rows carry it
    from embulk_input_marketo_spark.sources.debezium import parse_debezium

    row_schema = T.StructType(
        [f for f in evolved.fields if f.name != "warc_ts"]
    )
    good, quar = parse_debezium(raw, row_schema)
    assert quar.count() == 0
    batch = good.select(
        "op", "url", "value", "lang", "hit_count", "lsn", "warc_ts"
    )
    from embulk_input_marketo_spark.operators.dedup import lww_dedup

    deduped = lww_dedup(
        batch, key_cols="url", order_cols=["warc_ts", "lsn"]
    )
    merge_batch(spark, table, deduped, batch_id="wal1", lsn_col="lsn")
    final = {r.url: (r.value, r.lang, r.hit_count)
             for r in table.read(spark).collect()}
    assert final == {
        "a": (9.5, "de", 9),   # updated post-drift
        "b": (2.5, None, None),  # pre-drift row: new columns null
        "c": (3.5, "en", 7),
    }
