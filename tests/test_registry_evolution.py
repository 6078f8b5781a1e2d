"""Schema registry reconciliation + mid-stream evolution (FIXTURES.md A4/C.5):
add a column, rename, widen — applied as metadata-only commits; pre-evolution
rows read as NULL / old values round-trip unchanged."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable, merge_batch
from embulk_input_marketo_spark.registry import RegistryEntry, SchemaRegistry

BASE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.IntegerType()),
    ]
)


def _batch(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _mk_batch(spark, schema_cols, rows):
    df = spark.createDataFrame(rows, schema_cols)
    return df.select(
        "url",
        F.col("warc_ts").cast("timestamp"),
        *[c for c in schema_cols if c not in ("url", "warc_ts", "op", "_lsn")],
        "op",
        F.col("_lsn").cast("long"),
    )


def test_add_rename_widen_midstream(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t"), BASE_SCHEMA, n_buckets=4)
    registry = SchemaRegistry(
        [
            RegistryEntry(1, "text_encoding", "string", "add", effective_lsn=100),
            RegistryEntry(2, "language", "string", "rename:lang", effective_lsn=200),
            RegistryEntry(3, "score", "long", "widen:integer", effective_lsn=300),
            # unknown type name → defaults to string (MarketoField.java:23-29)
            RegistryEntry(4, "mystery", "tachyon_field", "add", effective_lsn=300),
        ]
    )

    # batch 1: pre-evolution (v1 schema)
    b1 = _mk_batch(
        spark,
        ["url", "warc_ts", "text", "lang", "score", "op", "_lsn"],
        [("u1", "2024-01-01 00:00:00", "hello", "en", 7, "I", 1),
         ("u2", "2024-01-01 00:00:01", "welt", "de", 9, "I", 2)],
    )
    registry.reconcile(table, up_to_lsn=50)  # nothing effective yet
    assert table.manifest().schema_version == 1
    merge_batch(spark, table, b1, batch_id="b1", checkpoint={"hwm_lsn": 50})

    # batch 2: after all evolution points
    changed = registry.reconcile(table, up_to_lsn=400)
    assert changed
    m = table.manifest()
    names = [f.name for f in m.current_schema().fields]
    assert "text_encoding" in names and "language" in names and "lang" not in names
    assert "mystery" in names
    assert dict((f.name, f.dataType.simpleString()) for f in m.current_schema().fields)[
        "score"
    ] == "bigint"
    assert dict((f.name, f.dataType.simpleString()) for f in m.current_schema().fields)[
        "mystery"
    ] == "string"

    # idempotent re-reconcile: no new commit
    v = table.current_version()
    assert not registry.reconcile(table, up_to_lsn=400)
    assert table.current_version() == v

    b2 = _mk_batch(
        spark,
        ["url", "warc_ts", "text", "language", "score", "text_encoding",
         "mystery", "op", "_lsn"],
        [("u3", "2024-01-01 00:00:02", "bonjour", "fr", 2**40, "utf-8", "m", "I", 301)],
    )
    merge_batch(spark, table, b2, batch_id="b2", checkpoint={"hwm_lsn": 400})

    out = {r["url"]: r for r in table.read(spark).collect()}
    # pre-evolution rows: renamed column carries old data, new cols NULL,
    # widened column round-trips unchanged
    assert out["u1"]["language"] == "en" and out["u2"]["language"] == "de"
    assert out["u1"]["text_encoding"] is None and out["u1"]["mystery"] is None
    assert out["u1"]["score"] == 7
    # post-evolution row: new columns populated, wide value intact
    assert out["u3"]["score"] == 2**40
    assert out["u3"]["text_encoding"] == "utf-8"


def test_drop_midstream(spark, tmp_path):
    """Mid-stream column drop (the reference's silent-removal on re-describe,
    LeadBulkExtractInputPlugin.java:55-63, as an explicit registry event):
    the column leaves reads, a source still sending it is ignored, and a
    later re-add does NOT resurrect pre-drop values."""
    table = LakeTable.create(str(tmp_path / "t4"), BASE_SCHEMA, n_buckets=4)
    registry = SchemaRegistry(
        [
            RegistryEntry(1, "lang", "string", "drop", effective_lsn=100),
            RegistryEntry(2, "lang", "string", "add", effective_lsn=200),
        ]
    )

    b1 = _mk_batch(
        spark,
        ["url", "warc_ts", "text", "lang", "score", "op", "_lsn"],
        [("u1", "2024-01-01 00:00:00", "hello", "en", 7, "I", 1)],
    )
    merge_batch(spark, table, b1, batch_id="b1", checkpoint={"hwm_lsn": 50})

    # drop takes effect
    assert registry.reconcile(table, up_to_lsn=150)
    names = [f.name for f in table.manifest().current_schema().fields]
    assert "lang" not in names
    assert "lang" not in table.read(spark).columns

    # a lagging source still sending 'lang' is silently ignored via replay's
    # rename translation; at the merge layer the column simply projects away
    b2 = _mk_batch(
        spark,
        ["url", "warc_ts", "text", "score", "op", "_lsn"],
        [("u2", "2024-01-01 00:00:01", "welt", 9, "I", 120)],
    )
    merge_batch(spark, table, b2, batch_id="b2", checkpoint={"hwm_lsn": 150})
    assert "lang" not in table.read(spark).columns

    # re-add the same name: pre-drop files must read NULL, not 'en'
    assert registry.reconcile(table, up_to_lsn=250)
    assert "lang" in [f.name for f in table.manifest().current_schema().fields]
    out = {r["url"]: r for r in table.read(spark).collect()}
    assert out["u1"]["lang"] is None
    assert out["u2"]["lang"] is None

    # drop of an absent column is an idempotent no-op
    v = table.current_version()
    table.evolve_schema([{"change": "drop", "name": "nope"}])
    assert [f.name for f in table.manifest().current_schema().fields] == \
        [f.name for f in table.manifest(v).current_schema().fields]


def test_illegal_widen_rejected(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t2"), BASE_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError, match="illegal promotion"):
        table.evolve_schema([{"change": "widen", "name": "score", "to_type": "boolean"}])


def test_rename_source_missing_rejected(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "t3"), BASE_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError, match="rename source missing"):
        table.evolve_schema([{"change": "rename", "old": "nope", "new": "x"}])
