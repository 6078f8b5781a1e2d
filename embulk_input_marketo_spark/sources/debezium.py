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


def discover_schema_drift(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """WAL-native schema discovery: fields present in the stream's row
    images but absent from the known schema — the "new ``lang`` column
    appears mid-stream" event. The reference re-describes the REST schema
    at the start of every run (``LeadBulkExtractInputPlugin.java:55-63``);
    a log tail has no describe endpoint, so the log itself is the describe:
    each envelope's after/before image is read as a map<string,string> (one
    ``from_json``, JVM-side, no inference over the whole stream) and unknown
    keys aggregate to one row per new field.

    Returns (field_name, field_type, first_lsn, n_seen):
    - ``field_type``: conservative vote over every observed value —
      boolean if all are true/false, else long if all try_cast to long,
      else double, else string (the reference's unknown-type default,
      ``MarketoField.java:23-29``). NULL JSON values abstain.
    - ``first_lsn``: the first change event carrying the field — the
      registry entry's ``effective_lsn``, so reconcile applies the column
      exactly at the batch that first needs it.

    Scale shape: map-side combined aggregate over (new-field, partial
    votes) — |new fields| rows out, one shuffle of scalar counters; the
    stream is read once and the known-field mass never leaves the map side
    (array_except on the keys happens before the explode)."""
    known = [f.name for f in row_schema.fields]
    img = F.coalesce(
        F.get_json_object(F.col(value_col), "$.payload.after"),
        F.get_json_object(F.col(value_col), "$.payload.before"),
    )
    kv = F.from_json(img, "map<string,string>")
    unknown_keys = F.array_except(F.map_keys(kv), F.array(*[F.lit(k) for k in known]))
    lsn = F.get_json_object(F.col(value_col), "$.payload.source.lsn").cast(
        "long"
    )
    pairs = (
        df.select(kv.alias("_kv"), unknown_keys.alias("_uk"), lsn.alias("_lsn"))
        .where(F.size("_uk") > 0)
        .select(
            F.explode("_uk").alias("field_name"),
            F.col("_kv"),
            F.col("_lsn"),
        )
        .select(
            "field_name",
            F.element_at(F.col("_kv"), F.col("field_name")).alias("_v"),
            "_lsn",
        )
    )
    v = F.col("_v")
    is_bool = F.lower(v).isin("true", "false")
    is_long = v.try_cast("long").isNotNull()
    is_double = v.try_cast("double").isNotNull()
    agg = pairs.groupBy("field_name").agg(
        F.min("_lsn").alias("first_lsn"),
        F.count(F.lit(1)).alias("n_seen"),
        # NULL values abstain from the vote (min of an empty set over the
        # non-null subset): coalesce each vote to 1 for null v
        F.min(F.when(v.isNull(), 1).otherwise(is_bool.cast("int"))).alias("_b"),
        F.min(F.when(v.isNull(), 1).otherwise(is_long.cast("int"))).alias("_l"),
        F.min(F.when(v.isNull(), 1).otherwise(is_double.cast("int"))).alias("_d"),
        F.max(F.when(v.isNull(), 0).otherwise(1)).alias("_any"),
    )
    field_type = (
        F.when(F.col("_any") == 0, "string")  # only nulls seen: default
        .when(F.col("_b") == 1, "boolean")
        .when(F.col("_l") == 1, "long")
        .when(F.col("_d") == 1, "double")
        .otherwise("string")
    )
    return agg.select(
        "field_name", field_type.alias("field_type"), "first_lsn", "n_seen"
    ).orderBy("field_name")


def drift_to_registry_entries(
    drift_rows: list,
    base_version: int,
) -> list:
    """Turn collected :func:`discover_schema_drift` rows into registry
    ``add`` entries (one version step per field, effective at the field's
    first lsn) — the bridge from log-observed drift to the same
    ``SchemaRegistry.reconcile`` path out-of-band registries use, so the
    lake schema update stays one metadata-only commit gated on the batch
    window. The drift frame is |new fields| rows — collecting it is O(new
    columns), never O(stream)."""
    from embulk_input_marketo_spark.registry import RegistryEntry

    return [
        RegistryEntry(
            version=base_version + i + 1,
            field_name=r["field_name"],
            field_type=r["field_type"],
            change="add",
            effective_lsn=int(r["first_lsn"]),
        )
        for i, r in enumerate(
            sorted(drift_rows, key=lambda r: (r["first_lsn"], r["field_name"]))
        )
    ]
