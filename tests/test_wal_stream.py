"""WAL tail under Structured Streaming: envelope files → parse → channel-
gated merge, with quarantine materialized per epoch and restart idempotence."""

import json
import os

from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.streaming.stream_replay import stream_wal_replay

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)
ROW = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _env(op, url, value, lsn):
    img = {"url": url, "value": value}
    return json.dumps(
        {
            "payload": {
                "op": op,
                "before": img if op == "d" else None,
                "after": None if op == "d" else img,
                "source": {"lsn": lsn, "ts_ms": 1704067200000 + lsn * 1000},
            }
        }
    )


def test_wal_tail_merges_and_quarantines(spark, tmp_path):
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    with open(os.path.join(wal, "chunk-0001.jsonl"), "w") as f:
        f.write(
            "\n".join(
                [
                    _env("c", "a", 1.0, 1),
                    _env("c", "b", 2.0, 2),
                    "{broken json",  # must land in quarantine, not vanish
                    _env("u", "a", 9.0, 3),
                    _env("d", "b", 2.0, 4),
                ]
            )
        )
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_wal_replay(spark, wal, table, ckpt, ROW)
    q.awaitTermination(120)
    final = {r.url: r.value for r in table.read(spark).collect()}
    assert final == {"a": 9.0}  # b deleted, a updated
    quar = spark.read.parquet(os.path.join(ckpt, "quarantine"))
    assert [r.reason for r in quar.collect()] == ["unparseable_envelope"]

    # restart over the same checkpoint: source offsets are consumed, the
    # epoch watermark gates any redelivery — state must not change
    q2 = stream_wal_replay(spark, wal, table, ckpt, ROW)
    q2.awaitTermination(120)
    assert {r.url: r.value for r in table.read(spark).collect()} == {"a": 9.0}

    # new WAL chunk arrives: only the delta applies
    with open(os.path.join(wal, "chunk-0002.jsonl"), "w") as f:
        f.write(_env("c", "c", 5.0, 5))
    q3 = stream_wal_replay(spark, wal, table, ckpt, ROW)
    q3.awaitTermination(120)
    assert {r.url: r.value for r in table.read(spark).collect()} == {
        "a": 9.0,
        "c": 5.0,
    }
