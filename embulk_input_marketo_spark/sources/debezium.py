"""Debezium/WAL envelope source: the standard CDC wire format → the
engine's changelog frame.

A binlog/WAL tail (Debezium over Kafka, DMS, Maxwell) delivers JSON
envelopes:

    {"payload": {"op": "c|u|d|r",
                 "before": {...} | null,
                 "after":  {...} | null,
                 "source": {"lsn": 123, "ts_ms": 1704067200000},
                 "ts_ms": ...}}

This module parses that into the frame every engine entry point
(operators/dedup.lww_dedup → lake/merge.merge_batch → replay) consumes:
one row per event with ``op`` ('I'/'U'/'D'), the payload columns, the
order minor ``lsn`` and the business-time major ``warc_ts``.

All JVM-side: one ``from_json`` against an explicit envelope schema (never
schema inference — a malformed producer must not reshape the pipeline),
``element_at``/struct field access, zero Python in the row path. Malformed
lines survive as NULL parses and are split to a quarantine output rather
than dropped silently — the invalid-record side-output discipline of the
reference's ``CsvTokenizer`` error modes (SURVEY.md §2 P8), applied to the
wire format that replaces its CSV.

Mapping notes (Debezium semantics):
- op 'c' (create), 'u' (update), 'r' (snapshot read — the initial-load rows
  a connector emits before the tail) → upserts; 'd' (delete) → tombstone.
- the row image is ``after`` for c/u/r and ``before`` for d (a delete's
  after is null; its before carries the last-known row, which the lake
  keeps on tombstones for late-arrival conflicts).
- Kafka TOMBSTONE messages (null value, emitted after 'd' for log
  compaction) parse to an all-null payload and are quarantined as
  non-events — they are a transport artifact, not a change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The Debezium envelope for a given row schema — explicit, so parsing
    never infers from (attacker-controlled) payload bytes."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("before", row_schema),
                        T.StructField("after", row_schema),
                        T.StructField(
                            "source",
                            T.StructType(
                                [
                                    T.StructField("lsn", T.LongType()),
                                    T.StructField("ts_ms", T.LongType()),
                                ]
                            ),
                        ),
                        T.StructField("ts_ms", T.LongType()),
                    ]
                ),
            )
        ]
    )


def _op_map(op: Column) -> Column:
    return (
        F.when(op.isin("c", "r"), "I")
        .when(op == "u", "U")
        .when(op == "d", "D")
        .otherwise(F.lit(None).cast("string"))
    )


def parse_debezium(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Parse a frame of raw envelope strings into (changelog, quarantine).

    changelog: ``op`` ('I'/'U'/'D'), the row-schema columns (after-image
    for upserts, before-image for deletes), ``lsn``, ``warc_ts``
    (source.ts_ms as a UTC timestamp — the LWW major key).

    quarantine: the raw lines that did NOT yield a usable event — broken
    JSON, unknown op codes, images missing for their op, null transport
    tombstones — with a ``reason``. Nothing is silently dropped; counting
    the quarantine is the ingest health metric."""
    env = F.from_json(F.col(value_col), envelope_schema(row_schema))
    p = env["payload"]
    parsed = df.select(
        F.col(value_col).alias("_raw"),
        p["op"].alias("_raw_op"),
        _op_map(p["op"]).alias("op"),
        p["before"].alias("_before"),
        p["after"].alias("_after"),
        p["source"]["lsn"].alias("lsn"),
        F.timestamp_millis(p["source"]["ts_ms"]).alias("warc_ts"),
    )
    image = F.when(F.col("op") == "D", F.col("_before")).otherwise(
        F.col("_after")
    )
    parsed = parsed.withColumn("_img", image)
    reason = (
        F.when(F.col("_raw").isNull(), "transport_tombstone")
        .when(F.col("_raw_op").isNull(), "unparseable_envelope")
        .when(F.col("op").isNull(), "unknown_op")
        .when(F.col("_img").isNull(), "missing_row_image")
        .when(F.col("lsn").isNull(), "missing_lsn")
        .when(F.col("warc_ts").isNull(), "missing_source_ts")
    )
    parsed = parsed.withColumn("_reason", reason)
    good = parsed.where(F.col("_reason").isNull()).select(
        "op",
        *[F.col("_img")[f.name].alias(f.name) for f in row_schema.fields],
        "lsn",
        "warc_ts",
    )
    quarantine = parsed.where(F.col("_reason").isNotNull()).select(
        F.col("_raw").alias("raw"), F.col("_reason").alias("reason")
    )
    return good, quarantine


def to_debezium(
    df: DataFrame,
    row_cols: list[str],
    op_col: str = "op",
    lsn_col: str = "lsn",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Serialize a changelog frame INTO envelopes (the test/round-trip twin
    of :func:`parse_debezium`, and the emit side for downstream Kafka).
    Upserts carry the row as ``after``; deletes as ``before`` — exactly the
    images the parser expects back."""
    row = F.struct(*[F.col(c) for c in row_cols])
    op = F.col(op_col)
    dbz_op = (
        F.when(op == "I", "c").when(op == "U", "u").when(op == "D", "d")
    )
    payload = F.struct(
        dbz_op.alias("op"),
        F.when(op == "D", row).otherwise(F.lit(None)).alias("before"),
        F.when(op != "D", row).otherwise(F.lit(None)).alias("after"),
        F.struct(
            F.col(lsn_col).cast("long").alias("lsn"),
            # cast: unix_millis takes TIMESTAMP, not TIMESTAMP_NTZ; engine
            # sessions run UTC so the conversion is wall-time identity
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
        ).alias("source"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    )
    return df.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )
