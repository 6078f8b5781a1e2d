"""The engine's query surface over the driver test tables, with ANSI-SQL
oracles for the DuckDB correctness gate.

Mapping of the engine's own data model onto the driver tables: ``events``
plays the changelog (event_id ≡ lsn — unique & monotone, ts ≡ warc_ts,
user_id ≡ url/key); ``documents``/``embeddings`` carry the training-data
pipeline operators; TPC-H-ish tables carry the join/rollup/coercion surface.

Every Spark column is aliased to the same name the oracle SQL produces;
float-accumulating aggregates go through DECIMAL casts so Spark and DuckDB
hash identically.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_input_marketo_spark.functions import similarity, textops
from embulk_input_marketo_spark.operators import dedup_docs, sanitize, shards
from embulk_input_marketo_spark.operators.dedup import lww_dedup
from embulk_input_marketo_spark.operators.windows import bounded_scan


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the rows across the session's parallelism BEFORE heavy
    per-row work. The bench fixture tables are single-file single-row-group
    parquet — unsplittable, so any expression fused into the scan stage
    runs in ONE task no matter how many cores the session has (r6 finding;
    guide §2.5 "input skew: one huge unsplittable file … repartition
    immediately after the read"). Costs one small shuffle of the raw rows;
    buys scan-stage parallelism for everything above it. On a real multi-
    file table the exchange is near-free relative to the map work it
    unlocks (and AQE coalescing keeps partition counts sane)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# CDC core (events ≡ changelog)
# ---------------------------------------------------------------------------

def _events_as_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic changelog view of events: signup→I, error→D, rest→U."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.col("user_id").cast("string").alias("url"),
        F.col("ts").alias("warc_ts"),
        F.col("value"),
        F.col("props"),
    )


def q_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: full engine replay — changelog → sliced batches → salted LWW
    dedup → manifest-gated MERGE into a lake table → read final state."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # throwaway lake on tmpfs when available: the query's cost should be the
    # replay plan, not the sandbox's intermittently-throttled virtio disk;
    # the caller still holds a lazy DataFrame over it, so reclaim at exit
    path = tempfile.mkdtemp(
        prefix="lake_q_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    # batch span derived from the lsn bounds replay computes anyway (no extra
    # full scan — a count() here used to add one more job over the changelog).
    # 2 slices: still a multi-slice replay (slice boundaries, idempotent
    # commits, cross-batch LWW all exercised — the result is slice-count
    # invariant), at half the per-batch fixed job cost of the old 4
    replay(spark, log, table, n_slices=2, salt_buckets=8)
    return table.read(spark).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
    )


def _sql_cdc_final_state() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    )
    SELECT user_id, ts, value, props FROM latest WHERE rn = 1 AND op <> 'D'
    """


def q_cdc_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed (the CDC engine EMITTING CDC): replay the changelog
    prefix lsn ≤ 5000 into the lake (snapshot v1), resume to the end (v2),
    then diff the snapshots — insert/update/delete per key, candidate
    buckets from a pure metadata pointer diff. Oracle: the same diff
    computed independently as two LWW prefix states over the raw events."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_cdf_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    replay(spark, log.where(F.col("lsn") <= 5000), table, n_slices=1)
    v1 = table.current_version()
    replay(spark, log, table, n_slices=1)
    return table.changes(spark, v1).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
        F.col("_change").alias("change"),
    )


def _sql_cdc_changes_feed() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), w1 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log WHERE lsn <= 5000
    ), w2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    ), s1 AS (SELECT * FROM w1 WHERE rn = 1),
    s2 AS (SELECT * FROM w2 WHERE rn = 1),
    j AS (
      SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
             s1.op AS op1, s2.op AS op2, s1.lsn AS lsn1, s2.lsn AS lsn2,
             s1.ts AS ts1, s1.value AS v1, s1.props AS p1,
             s2.ts AS ts2, s2.value AS v2, s2.props AS p2
      FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    )
    SELECT user_id,
           CASE WHEN change = 'delete' THEN ts1 ELSE ts2 END AS ts,
           CASE WHEN change = 'delete' THEN v1 ELSE v2 END AS value,
           CASE WHEN change = 'delete' THEN p1 ELSE p2 END AS props,
           change
    FROM (
      SELECT *,
             CASE WHEN (op2 IS NOT NULL AND op2 <> 'D')
                       AND NOT (op1 IS NOT NULL AND op1 <> 'D')
                  THEN 'insert'
                  WHEN (op1 IS NOT NULL AND op1 <> 'D')
                       AND NOT (op2 IS NOT NULL AND op2 <> 'D')
                  THEN 'delete'
                  WHEN (op1 IS NOT NULL AND op1 <> 'D')
                       AND (op2 IS NOT NULL AND op2 <> 'D')
                       AND lsn1 <> lsn2
                  THEN 'update' END AS change
      FROM j
    ) WHERE change IS NOT NULL
    """


def q_cdc_changes_preimage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDF with Delta-style update PRE-images: same snapshot diff as
    cdc_changes_feed, but updates emit (update_preimage, update_postimage)
    row pairs so incremental consumers can retract the old contribution.
    Oracle: the two-prefix LWW diff emitting both sides of each update."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_cdfpre_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    replay(spark, log.where(F.col("lsn") <= 5000), table, n_slices=1)
    v1 = table.current_version()
    replay(spark, log, table, n_slices=1)
    return table.changes(spark, v1, include_preimage=True).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
        F.col("_change").alias("change"),
    )


def _sql_cdc_changes_preimage() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), w1 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log WHERE lsn <= 5000
    ), w2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    ), s1 AS (SELECT * FROM w1 WHERE rn = 1),
    s2 AS (SELECT * FROM w2 WHERE rn = 1),
    j AS (
      SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
             s1.op AS op1, s2.op AS op2, s1.lsn AS lsn1, s2.lsn AS lsn2,
             s1.ts AS ts1, s1.value AS v1, s1.props AS p1,
             s2.ts AS ts2, s2.value AS v2, s2.props AS p2
      FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    ), cls AS (
      SELECT *,
             CASE WHEN (op2 IS NOT NULL AND op2 <> 'D')
                       AND NOT (op1 IS NOT NULL AND op1 <> 'D')
                  THEN 'insert'
                  WHEN (op1 IS NOT NULL AND op1 <> 'D')
                       AND NOT (op2 IS NOT NULL AND op2 <> 'D')
                  THEN 'delete'
                  WHEN (op1 IS NOT NULL AND op1 <> 'D')
                       AND (op2 IS NOT NULL AND op2 <> 'D')
                       AND lsn1 <> lsn2
                  THEN 'update' END AS change
      FROM j
    )
    SELECT user_id, ts2 AS ts, v2 AS value, p2 AS props,
           'insert' AS change
    FROM cls WHERE change = 'insert'
    UNION ALL
    SELECT user_id, ts1, v1, p1, 'delete' FROM cls WHERE change = 'delete'
    UNION ALL
    SELECT user_id, ts1, v1, p1, 'update_preimage'
    FROM cls WHERE change = 'update'
    UNION ALL
    SELECT user_id, ts2, v2, p2, 'update_postimage'
    FROM cls WHERE change = 'update'
    """


def q_time_travel_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE (Delta RESTORE / Iceberg rollback): replay the lsn ≤ 5000
    changelog prefix (v1), replay to the end (v2), then ``restore(v1)`` —
    a metadata-only commit that re-points every bucket at v1's file lists —
    and read the table. Oracle: the LWW state over the prefix alone; the
    rolled-back suffix must leave no trace. The checkpoint rolls back with
    the data, so a resumed replay re-ingests exactly the suffix (pytest
    asserts the convergence half)."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_restore_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    replay(spark, log.where(F.col("lsn") <= 5000), table, n_slices=1)
    v1 = table.current_version()
    replay(spark, log, table, n_slices=1)
    table.restore(v1)
    return table.read(spark).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
    )


def _sql_time_travel_restore() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log WHERE lsn <= 5000
    )
    SELECT user_id, ts, value, props FROM latest WHERE rn = 1 AND op <> 'D'
    """


def q_wal_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAL wire format: serialize the events-derived changelog into
    Debezium envelopes (upserts as after-images, deletes as before-images,
    source.lsn/ts_ms), then parse the JSON back through the explicit-schema
    envelope parser. Round-trip identity IS the gate: any asymmetry in op
    mapping, image selection, or the ms-precision time carry shows up
    against the oracle, which projects the same changelog directly from the
    raw events (never touching JSON). ts lands at Debezium's millisecond
    precision on both sides."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.sources.debezium import (
        parse_debezium,
        to_debezium,
    )

    log = _events_as_changelog(spark, sf_dir)
    row_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    wire = to_debezium(
        log.select("op", "url", "value", "props", "lsn", "warc_ts"),
        row_cols=["url", "value", "props"],
        lsn_col="lsn",
    )
    good, _quarantine = parse_debezium(wire, row_schema)
    return good.select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").cast("timestamp_ntz").alias("ts"),
        "value",
        "props",
        "op",
        "lsn",
    )


def _sql_wal_envelope_roundtrip() -> str:
    return """
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           make_timestamp(epoch_ms(ts) * 1000) AS ts,
           value, props,
           CASE WHEN event_type = 'signup' THEN 'I'
                WHEN event_type = 'error'  THEN 'D'
                ELSE 'U' END AS op,
           event_id AS lsn
    FROM events
    """


def q_wal_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL-native schema discovery: the producer starts emitting two new
    fields (`lang` string, `hit_count` long) at lsn > 5000 — mid-stream, no
    describe endpoint. The engine reads each envelope image as a
    map<string,string> and votes a conservative type per unknown field.
    Oracle: the drift summary computed directly from the raw events (name,
    voted type, first lsn carrying the field, occurrence count)."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.sources.debezium import (
        discover_schema_drift,
        to_debezium,
    )

    log = _events_as_changelog(spark, sf_dir)
    extended = log.withColumn(
        "lang",
        F.when(
            F.col("lsn") > 5000,
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("lsn") % 3 + 1).cast("int"),
            ),
        ),
    ).withColumn(
        "hit_count",
        F.when(F.col("lsn") > 5000, F.col("lsn") % 100),
    )
    wire = to_debezium(
        extended,
        row_cols=["url", "value", "props", "lang", "hit_count"],
        lsn_col="lsn",
    )
    known = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return discover_schema_drift(wire, known).select(
        "field_name", "field_type", "first_lsn", "n_seen"
    )


def _sql_wal_schema_drift() -> str:
    # to_json drops null fields, so a field "appears" exactly on the rows
    # where the when() above is non-null: every event with lsn > 5000
    return """
    WITH post AS (SELECT event_id AS lsn FROM events WHERE event_id > 5000)
    SELECT 'hit_count' AS field_name, 'long' AS field_type,
           (SELECT MIN(lsn) FROM post) AS first_lsn,
           (SELECT COUNT(*) FROM post) AS n_seen
    UNION ALL
    SELECT 'lang', 'string',
           (SELECT MIN(lsn) FROM post), (SELECT COUNT(*) FROM post)
    ORDER BY field_name
    """


def q_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LWW reducer alone (salted two-phase) — latest event per user."""
    ev = _t(spark, sf_dir, "events")
    out = lww_dedup(
        ev.select(
            F.col("user_id"), F.col("ts"), F.col("event_id"), F.col("value")
        ),
        key_cols="user_id",
        order_cols=["ts", "event_id"],
        salt_buckets=8,
    )
    return out.select("user_id", "ts", F.col("event_id").alias("last_event_id"), "value")


def _sql_lww_dedup() -> str:
    return """
    SELECT user_id, ts, event_id AS last_event_id, value
    FROM (SELECT user_id, ts, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) rn
          FROM events) WHERE rn = 1
    """


def q_incremental_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded half-open (hwm, hi] scan of the log (C1) — the bulk-export
    window replacement; predicate pushes to the parquet scan."""
    ev = _t(spark, sf_dir, "events").withColumnRenamed("event_id", "lsn")
    w = bounded_scan(ev, 2_500, 7_500)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
    )


def _sql_incremental_window() -> str:
    return """
    SELECT event_type, COUNT(*) AS n_events,
           MIN(event_id) AS min_lsn, MAX(event_id) AS max_lsn
    FROM events WHERE event_id > 2500 AND event_id <= 7500
    GROUP BY event_type
    """


def q_window_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range slicing (C2): per-slice row counts and lsn bounds — the ≤30-day
    export-window analogue (MarketoUtils.sliceRange:100-113)."""
    span = 1_000
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("slice_id", F.floor(F.col("event_id") / span))
        .groupBy("slice_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("lsn_lo"),
            F.max("event_id").alias("lsn_hi"),
        )
    )


def _sql_window_slices() -> str:
    return """
    SELECT CAST(FLOOR(event_id / 1000) AS BIGINT) AS slice_id,
           COUNT(*) AS n_events, MIN(event_id) AS lsn_lo, MAX(event_id) AS lsn_hi
    FROM events GROUP BY 1
    """


def q_checkpoint_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-table metrics rollup (A3 analogue): per key-partition lineage
    counters committed with each batch."""
    ev = _t(spark, sf_dir, "events")
    part = F.pmod(F.col("user_id"), F.lit(4)).alias("partition_id")
    return ev.groupBy(part).agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.min("event_id").alias("min_lsn"),
        F.max("event_id").alias("hwm_lsn"),
        F.count_distinct("user_id").alias("n_keys"),
        # exact decimal sum internally; the TRANSPORTED column is DOUBLE on
        # both engines — the driver's value hash canonicalizes DECIMAL
        # inconsistently across engines even when values are equal (round-2
        # finding), while double conversion of equal decimals is bit-identical
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


def _sql_checkpoint_rollup() -> str:
    return """
    SELECT user_id % 4 AS partition_id, COUNT(*) AS rows_in,
           MIN(event_id) AS min_lsn, MAX(event_id) AS hwm_lsn,
           COUNT(DISTINCT user_id) AS n_keys,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Parsing / coercion / sanitization (reference §2.2)
# ---------------------------------------------------------------------------

def q_coerce_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late type coercion of stringly JSON payloads (P4): props JSON →
    typed long, with the reference's ''/'null' → NULL rule.

    r6: the JSON path eval is extracted to its own projection behind a
    localCheckpoint barrier. GetJsonObject is CodegenFallback, so codegen
    subexpression elimination never collapses repeated references — the
    original single-select form evaluated the parse ~4x per row (3 refs
    inside the nullify CASE, duplicated again by filter pushdown; plan in
    plans/r06/coerce_props_before.txt), at ~3.4 s per 1M-row pass. One
    parse + cheap attribute arithmetic is ~3x faster end to end; results
    are identical (same expression tree over the parsed value)."""
    from embulk_input_marketo_spark.operators.coerce import nullify

    ev = _t(spark, sf_dir, "events")
    raw = _spread(ev.select("event_id", "props")).select(
        F.col("event_id"),
        F.get_json_object("props", "$.k").alias("_raw"),
    ).localCheckpoint(eager=False)
    k = nullify(F.col("_raw")).cast("long")
    return (
        raw.select(F.col("event_id"), k.alias("k_typed"))
        .where(F.col("k_typed").isNotNull())
    )


def _sql_coerce_props() -> str:
    return """
    SELECT event_id, CAST(NULLIF(NULLIF(json_extract_string(props, '$.k'), ''),
                                 'null') AS BIGINT) AS k_typed
    FROM events
    WHERE CAST(NULLIF(NULLIF(json_extract_string(props, '$.k'), ''), 'null') AS BIGINT)
          IS NOT NULL
    """


def q_sanitize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-id sanitization (P10): trim, drop empties, keep numeric only."""
    ev = _t(spark, sf_dir, "events")
    raw = ev.select(
        F.when(F.col("event_type") == "error",
               F.concat(F.lit("x"), F.col("user_id").cast("string")))
        .otherwise(F.concat(F.lit(" "), F.col("user_id").cast("string"),
                            F.lit(" ")))
        .alias("raw_id")
    )
    ids = raw.select(F.trim("raw_id").alias("id")).where(F.col("id") != "")
    return (
        sanitize.valid_ids(ids)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _sql_sanitize_ids() -> str:
    return """
    WITH raw AS (
      SELECT CASE WHEN event_type = 'error'
                  THEN 'x' || CAST(user_id AS VARCHAR)
                  ELSE ' ' || CAST(user_id AS VARCHAR) || ' ' END AS raw_id
      FROM events
    ), ids AS (SELECT TRIM(raw_id) AS id FROM raw WHERE TRIM(raw_id) <> '')
    SELECT id, COUNT(*) AS n FROM ids
    WHERE regexp_full_match(id, '[0-9]+') GROUP BY id
    """


def q_missing_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Requested-vs-actual reconciliation: left-anti join (the reference's
    warn-on-missing loop, MarketoBaseInputPluginDelegate.java:139-161)."""
    ev = _t(spark, sf_dir, "events")
    # the request list includes ids that DON'T exist (user_id+1000 for every
    # 7th user) so the anti-join provably returns rows — a vacuous 0-row pass
    # would hide a broken operator (round-1 finding)
    requested = (
        ev.select(F.col("user_id").alias("id"))
        .unionByName(
            ev.where(F.col("user_id") % 7 == 0)
            .select((F.col("user_id") + 1000).alias("id"))
        )
        .distinct()
    )
    actual = (
        ev.where(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("id"))
        .distinct()
    )
    return sanitize.missing_ids(requested, actual)


def _sql_missing_ids() -> str:
    return """
    WITH requested AS (
      SELECT user_id AS id FROM events
      UNION
      SELECT user_id + 1000 FROM events WHERE user_id % 7 = 0
    )
    SELECT id FROM requested
    EXCEPT
    SELECT DISTINCT user_id AS id FROM events WHERE event_type = 'signup'
    """


# ---------------------------------------------------------------------------
# Joins / enrichment / rollups
# ---------------------------------------------------------------------------

def q_fanout_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-ids × child-records fan-out as a broadcast join (P7/§2.4):
    orders enriched with their customer's nation, revenue per nation."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # customer ⋈ nation on nationkey (both small → broadcast), then the big
    # fact stream joins the broadcast dimension — no shuffle of orders
    dim = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select(F.col("c_custkey"), F.col("n_name"))
    enriched = orders.join(F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"])
    return enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact decimal sum internally, DOUBLE across the gate (see
        # q_checkpoint_rollup — decimal is the unstable transport type)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def _sql_fanout_enrichment() -> str:
    return """
    SELECT n.n_name AS n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """


def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate — partial+final hash aggregation, decimal
    exactness (the metrics-rollup pattern at table scale)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sums internally, DOUBLE across the gate (see
            # q_checkpoint_rollup — decimal is the unstable transport type)
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(28,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _sql_pricing_rollup() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling business-time windows (§2.7): daily event counts — the
    fetch_days window analogue, streaming-compatible shape."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "n_events",
        )
    )


def _sql_tumbling_window() -> str:
    return """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------

def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (r6: _spread A/B'd a dead heat here — one split+size pass is cheap
    # enough that the exchange buys nothing; left on the scan)
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textops.token_count("text").alias("n_tokens")
    )


def _sql_token_count() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS n_tokens
    FROM documents
    """


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenizer counts side by side — the two
    token-budget estimators of corpus assembly (whitespace undercounts
    punctuation-heavy text; the pre-tokenizer count is the lower bound a
    real BPE refines)."""
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select(
        "doc_id",
        textops.token_count("text").alias("ws_tokens"),
        textops.bpe_token_count("text").alias("bpe_tokens"),
    )


def _sql_bpe_token_count() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS bpe_tokens
    FROM documents
    """


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (size=32, overlap=8 whitespace
    tokens — small enough that sf0.01 docs produce multi-chunk output).
    Plan: split → sequence → one Generate, no shuffle, no UDF; the oracle
    replays the identical start/coverage rule with generate_series."""
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return textops.chunk_documents(
        docs, "text", id_cols=["doc_id"], size=32, overlap=8
    )


def _sql_chunk_documents() -> str:
    # stride = size - overlap = 24; chunk k covers tokens [k*24, k*24+32);
    # extra = max(ceil((n - 32)/24), 0) trailing chunks beyond the first
    return r"""
    WITH w AS (
      -- regexp strip of ALL leading/trailing whitespace (TRIM is space-only
      -- in both engines), matching the engine's normalization exactly
      SELECT doc_id,
             regexp_split_to_array(
               regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS words
      FROM documents
      WHERE text IS NOT NULL
        AND regexp_replace(text, '^\s+|\s+$', '', 'g') <> ''
    ),
    c AS (
      SELECT doc_id, words, len(words) AS n,
             GREATEST(CAST(ceil((len(words) - 32) / 24.0) AS BIGINT), 0)
               AS extra
      FROM w
    ),
    e AS (
      SELECT doc_id, words, n,
             UNNEST(generate_series(0, extra)) AS chunk_idx
      FROM c
    )
    SELECT doc_id, chunk_idx,
           array_to_string(words[chunk_idx*24+1 : chunk_idx*24+32], ' ')
             AS chunk_text,
           LEAST(n - chunk_idx*24, 32) AS n_tokens
    FROM e
    """


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII screening over web text: deterministic emails/IPs/phones are
    planted from doc_id (every doc an email, every 2nd an IPv4, every 3rd a
    phone), then counted and redacted with the shared ordered pattern
    table. The oracle replays the identical regex chain in RE2 — the
    patterns are kept to the Java∩RE2 dialect intersection on purpose."""
    d = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"),
        F.lit("@example"), (d % 7).cast("string"), F.lit(".com"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit(" from 10.0."), (d % 250).cast("string"),
                     F.lit("."), (d % 100).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" call +1 555 010"),
                     (d % 90 + 10).cast("string")),
        ).otherwise(F.lit("")),
    )
    # (r6 note: a staged per-pattern chain with barriers was measured
    # SLOWER here — 3.6 s -> 4.0 s at sf1.0: the three regex passes are
    # codegen'd and already shared, and the checkpoint materialization of
    # the intermediate text outweighed the saved passes. Kept inline.)
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id", pii_text.alias("_t")
    )
    counts = textops.pii_counts(F.col("_t"))
    return docs.select(
        "doc_id",
        counts["n_email"].alias("n_email"),
        counts["n_ip"].alias("n_ip"),
        counts["n_phone"].alias("n_phone"),
        textops.pii_redact(F.col("_t")).alias("redacted"),
    )


def _sql_pii_redact() -> str:
    return r"""
    WITH pii AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example' || (doc_id % 7)
                  || '.com'
                  || CASE WHEN doc_id % 2 = 0
                          THEN ' from 10.0.' || (doc_id % 250) || '.'
                               || (doc_id % 100)
                          ELSE '' END
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' call +1 555 010' || (doc_id % 90 + 10)
                          ELSE '' END AS t
      FROM documents
    ), s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(
               t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_email,
             regexp_replace(
               t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t
      FROM pii
    ), s2 AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(
               t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
               AS BIGINT) AS n_ip,
             regexp_replace(
               t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '<IP>', 'g') AS t
      FROM s1
    )
    SELECT doc_id, n_email, n_ip,
           CAST(len(regexp_extract_all(t, '\+?[0-9][0-9()\- ]{6,}[0-9]'))
             AS BIGINT) AS n_phone,
           regexp_replace(t, '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')
             AS redacted
    FROM s2
    """


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select("doc_id", textops.quality_score("text").alias("quality"))


def _sql_quality_score() -> str:
    return """
    WITH c AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
             CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space
      FROM documents
    )
    SELECT doc_id,
           ROUND(0.5 * (n_alpha / CAST(GREATEST(n_chars, 1) AS DOUBLE))
                 + 0.2 * LEAST((n_space / CAST(GREATEST(n_chars, 1) AS DOUBLE)) * 5, 1.0)
                 + 0.3 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0), 6) AS quality
    FROM c
    """


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r6: stage the four per-language regex counts as their own projection
    # behind a localCheckpoint barrier, then fold the argmax over the cheap
    # attributes — the inline form re-ran the regexes once per argmax
    # reference (textops.lang_id_argmax docstring; 14.5 s -> 2.0 s at
    # sf1.0, hash-identical)
    docs = _t(spark, sf_dir, "documents")
    lc = F.lower(F.col("text"))
    scored = _spread(docs.select("text")).select(
        *[
            textops.stopword_hits(lc, lang).alias(f"_s_{lang}")
            for lang in textops._STOPWORDS
        ]
    ).localCheckpoint(eager=False)
    pred = textops.lang_id_argmax(
        {lang: F.col(f"_s_{lang}") for lang in textops._STOPWORDS}
    )
    return (
        scored.select(pred.alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _sql_lang_id() -> str:
    # mirror of textops._STOPWORDS scoring with strictly-greater argmax:
    # hits = split-count on one alternation regex per language
    def hits(lang_words):
        alt = "|".join(lang_words)
        return (
            f"CAST(len(regexp_split_to_array(t, '\\b({alt})\\b')) - 1 AS BIGINT)"
        )

    from embulk_input_marketo_spark.functions.textops import _STOPWORDS

    score_cols = ",\n           ".join(
        f"({hits(ws)}) AS s_{lang}" for lang, ws in _STOPWORDS.items()
    )
    langs = list(_STOPWORDS)
    # fold argmax with earlier-language-wins-ties (strictly greater)
    expr = "'und'"
    best = "CAST(0 AS BIGINT)"
    for lang in langs:
        expr = f"CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"GREATEST({best}, s_{lang})"
    return f"""
    WITH lc AS (SELECT lower(text) AS t FROM documents),
    scored AS (SELECT {score_cols} FROM lc)
    SELECT {expr} AS lang_pred, COUNT(*) AS n_docs FROM scored GROUP BY 1
    """


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-identical extraction invariant (input_hint), inside the gate:
    build html from documents.text, run the Arrow pandas UDF, compare against
    a pure-SQL oracle of the same transform."""
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>d</title></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    return docs.select(
        "doc_id", textops.extract_text(html).alias("extracted")
    )


def _sql_extract_text() -> str:
    return r"""
    SELECT doc_id,
           TRIM(regexp_replace(
             regexp_replace('<html><head><title>d</title></head><body><p>'
                            || text || '</p></body></html>', '<[^>]*>', ' ', 'g'),
             '\s+', ' ', 'g')) AS extracted
    FROM documents
    """


def q_doc_stats_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary column + typed metadata extraction
    through mapInPandas (decode itself is a stub at byte level here)."""
    from embulk_input_marketo_spark.functions.multimodal import binary_metadata

    docs = _t(spark, sf_dir, "documents")
    with_bin = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return binary_metadata(with_bin, "payload")


def _sql_doc_stats_bytes() -> str:
    return """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           left(text, 4) AS magic
    FROM documents
    """


# ---------------------------------------------------------------------------
# Dedup family & similarity over documents / embeddings
# ---------------------------------------------------------------------------

def _docs_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic duplicates (every 10th doc re-emitted with
    doc_id+100000) — guarantees the near-dup operators have work to do."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


def _synth_text(h: F.Column) -> F.Column:
    """8 four-hex-char words from an md5 — deterministic document text that
    is unrelated to every corpus doc (no shared shingles), identical across
    engines (Spark md5/substr ≡ DuckDB md5/substr on the same input)."""
    return F.concat_ws(" ", *[F.substring(h, 1 + 4 * k, 4) for k in range(8)])


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: tonight's crawl batch against the persisted
    corpus signature index — never rescanning the corpus text. The index is
    built over `documents`; the batch mixes (a) exact copies of corpus docs
    (→ dup_of_corpus), (b) brand-new synthetic docs (→ keep), and (c)
    pairs of identical new docs (first keeps, second → dup_in_batch).
    Decision = banded-LSH candidacy (share any band), which at this fixture
    scale is exactly text equality (no cross-band collisions — the same
    invariant the minhash/simhash oracles pin). Oracle: text-equality
    EXISTS checks against the corpus and against earlier batch ids."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(
        prefix="mh_index_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    index_path = f"{path}/minhash_index"
    dedup_docs.write_minhash_index(docs, index_path)

    d = F.col("doc_id")
    a = docs.where(d % 10 == 0).select(
        (d + 100000).alias("doc_id"), "text"
    )
    b = docs.where(d % 10 == 1).select(
        (d + 200000).alias("doc_id"),
        _synth_text(F.md5(d.cast("string"))).alias("text"),
    )
    c_text = _synth_text(F.md5(F.concat(F.lit("c"), d.cast("string"))))
    c1 = docs.where(d % 10 == 2).select(
        (d + 300000).alias("doc_id"), c_text.alias("text")
    )
    c2 = docs.where(d % 10 == 2).select(
        (d + 400000).alias("doc_id"), c_text.alias("text")
    )
    batch = a.unionByName(b).unionByName(c1).unionByName(c2)
    return dedup_docs.incremental_dedup(batch, index_path).orderBy("doc_id")


def _sql_incremental_dedup() -> str:
    synth = (
        "concat_ws(' ', "
        + ", ".join(f"substr(h, {1 + 4 * k}, 4)" for k in range(8))
        + ")"
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ), synth_b AS (
      SELECT doc_id + 200000 AS doc_id,
             {synth.replace('h,', "md5(CAST(doc_id AS VARCHAR)),")} AS t
      FROM documents WHERE doc_id % 10 = 1
    ), synth_c AS (
      SELECT doc_id,
             {synth.replace('h,', "md5('c' || CAST(base_id AS VARCHAR)),")} AS t
      FROM (
        SELECT doc_id AS base_id, doc_id + 300000 AS doc_id
        FROM documents WHERE doc_id % 10 = 2
        UNION ALL
        SELECT doc_id, doc_id + 400000 FROM documents WHERE doc_id % 10 = 2
      )
    ), batch AS (
      SELECT doc_id + 100000 AS doc_id,
             regexp_replace(TRIM(lower(text)), '\\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL SELECT * FROM synth_b
      UNION ALL SELECT * FROM synth_c
    )
    SELECT n.doc_id,
           EXISTS(SELECT 1 FROM corpus o WHERE o.t = n.t) AS dup_of_corpus,
           EXISTS(SELECT 1 FROM batch m
                  WHERE m.t = n.t AND m.doc_id < n.doc_id) AS dup_in_batch,
           NOT EXISTS(SELECT 1 FROM corpus o WHERE o.t = n.t)
           AND NOT EXISTS(SELECT 1 FROM batch m
                          WHERE m.t = n.t AND m.doc_id < n.doc_id) AS keep
    FROM batch n ORDER BY doc_id
    """


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_docs.exact_dedup(_docs_with_copies(spark, sf_dir))


def _sql_exact_dedup() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM docs
    )
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS group_size FROM norm GROUP BY t
    """


def q_minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH candidate generation verified by exact n-gram Jaccard at
    0.999 — on the copies fixture the confirmed pairs are exactly the
    duplicate pairs, giving the full pipeline a SQL oracle."""
    docs = _docs_with_copies(spark, sf_dir)
    pairs = dedup_docs.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, shingle_n=3
    )
    verified = dedup_docs.ngram_jaccard(pairs, docs, n=3, threshold=0.999)
    return verified.select("left_id", "right_id")


def _sql_minhash_dedup_pairs() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM docs
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id
    FROM norm a JOIN norm b ON a.t = b.t AND a.doc_id < b.doc_id
    """


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded SimHash near-dup search (bands=4, hamming ≤ 3) — the
    full banded candidate generation + bit_count verify runs, and the gate
    checks its SQL-predictable subset: the hamming-0 pairs, which must be
    EXACTLY the text-equal pairs (verified: the fixture's 50 copy pairs, no
    false collisions). The hamming 1–3 finds are genuine near-dups no SQL
    oracle can enumerate; their recall/precision is pinned in
    tests/test_dedup_and_text.py."""
    docs = _docs_with_copies(spark, sf_dir)
    pairs = dedup_docs.simhash_hamming_pairs(
        docs, shingle_n=2, bands=4, max_hamming=3
    )
    return pairs.where(F.col("hamming") == 0)


def _sql_simhash_pairs() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM docs
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
           CAST(0 AS INTEGER) AS hamming
    FROM norm a JOIN norm b ON a.t = b.t AND a.doc_id < b.doc_id
    """


def q_ngram_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on a bounded candidate set (first 40 docs) —
    SQL-oracle-checkable via unnested gram sets."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 40
    )
    a = docs.select(F.col("doc_id").alias("left_id"))
    b = docs.select(F.col("doc_id").alias("right_id"))
    pairs = a.crossJoin(b).where(F.col("left_id") < F.col("right_id"))
    j = dedup_docs.ngram_jaccard(pairs, docs, n=1, threshold=0.0)
    return j.where(F.col("jaccard") > 0.2)


def _sql_ngram_jaccard_matrix() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id < 40
    ), grams_d AS (SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(string_split(t, ' ')) AS g FROM docs)
    ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams_d GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS i
      FROM grams_d a JOIN grams_d b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.left_id, i.right_id,
           ROUND(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
    FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
    JOIN sizes sb ON sb.doc_id = i.right_id
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) > 0.2
    """


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (exact ANN baseline) for 3 query vectors."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.brute_force_topk(emb, queries, k=5)


def _sql_embedding_topk() -> str:
    return """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
      FROM e CROSS JOIN q
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table multi-probe LSH ANN top-k. The oracle is the EXACT
    brute-force top-k SQL: with these parameters the candidate pool covers
    the true top-5 for every query on the fixture, so the approximate path
    must reproduce the exact answer — recall 1.0 is the checked contract
    (round 1 had no oracle and starving buckets returned 7/15 rows)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ann_topk(
        emb, queries, dim=64, k=5, n_planes=6, n_tables=8, probe_bits=2
    )


def q_ann_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN against the MATERIALIZED partitioned index (write_ann_index →
    ann_topk_indexed): same parameters as ann_topk, so the same exact
    brute-force oracle applies — and the scan is partition-pruned to the
    probe set instead of re-exploding the table per query."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = tempfile.mkdtemp(
        prefix="ann_idx_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    idx = f"{path}/index"
    similarity.write_ann_index(
        emb, idx, dim=64, n_planes=6, n_tables=8
    )
    return similarity.ann_topk_indexed(spark, idx, queries, k=5, probe_bits=2)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (bounded candidate set): the
    exact-verification stage of embedding dedup; the LSH-bucketed variant
    (ann path) generates candidates at scale."""
    base = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # inject deterministic near-duplicate vectors (every 20th vector shifted
    # by +0.1 per component → cosine ≈ 0.99) the way _docs_with_copies seeds
    # text dups — the ≥0.85 filter must return rows or the check is vacuous
    copies = base.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.1)).alias("v"),
    )
    emb = base.unionByName(copies)
    a = emb.select(F.col("vec_id").alias("left_id"), F.col("v").alias("_va"))
    b = emb.select(F.col("vec_id").alias("right_id"), F.col("v").alias("_vb"))
    pairs = a.crossJoin(b).where(F.col("left_id") < F.col("right_id"))
    return (
        pairs.withColumn(
            "cos_sim", F.round(similarity.cosine(F.col("_va"), F.col("_vb")), 6)
        )
        .where(F.col("cos_sim") >= 0.85)
        .select("left_id", "right_id", "cos_sim")
    )


def _sql_embedding_near_dup() -> str:
    return """
    WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                WHERE vec_id < 200),
    e AS (
      SELECT vec_id, v FROM e0
      UNION ALL
      SELECT vec_id + 100000, list_transform(v, x -> x + 0.1)
      FROM e0 WHERE vec_id % 20 = 0
    )
    SELECT a.vec_id AS left_id, b.vec_id AS right_id,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.85
    """


def _emb_with_planted_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ 5 planted near-neighbors per query vector (vec_id<3):
    copy j perturbs every component by +0.02·j, so the true top-k of each
    query is itself plus its planted cluster — geometry IVF/ANN can exploit
    (uniform random vectors have near-orthogonal 'neighbors' spread across
    every cell, which no honest pruning can cover)."""
    base = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = (
        base.where(F.col("vec_id") < 3)
        .crossJoin(spark.range(1, 6).select(F.col("id").alias("j")))
        .select(
            (F.lit(100000) + F.col("vec_id") * 10 + F.col("j")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.02) * F.col("j")
            ).alias("embedding"),
        )
    )
    return base.unionByName(planted)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN over the planted-cluster fixture: each query's
    true top-5 (itself + its nearest planted copies) lives in the query's own
    centroid cell, so probing 2 of 8 cells — REAL pruning — must reproduce
    the exact brute-force top-5 (the SQL oracle)."""
    emb = _emb_with_planted_clusters(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(
        emb, queries, dim=64, k=5, n_cells=8, n_probe=2
    )


def _sql_ivf_topk() -> str:
    return """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planted AS (
      SELECT 100000 + b.vec_id * 10 + j.j AS vec_id,
             list_transform(b.v, x -> x + 0.02 * j.j) AS v
      FROM base b, range(1, 6) j(j) WHERE b.vec_id < 3
    ),
    e AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
      FROM e CROSS JOIN q
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """


def q_kmeans_refine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations over the md5 centroid draw, then per-cell
    membership counts + refined-centroid norms — the IVF/SemDeDup
    "re-train offline, swap the centroid table" maintenance job, value-
    checked end to end: the oracle replays BOTH iterations (assignment
    argmax, per-position means, empty-cell carry-over) in SQL, so a drift
    in any step of the k-means trajectory flips the hash."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = similarity.kmeans_refine(
        emb, similarity.md5_centroids(emb, n_cells=8), n_iters=2
    )
    counts = (
        similarity.assign_cells(emb, cents, round_scores=6)
        .groupBy("_cell")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    return (
        cents.join(counts, cents.cell_id == counts._cell, "left")
        .select(
            "cell_id",
            F.coalesce("n_members", F.lit(0)).cast("long").alias("n_members"),
            F.round(similarity._norm(F.col("centroid")), 6).alias(
                "centroid_norm"
            ),
        )
    )


def _sql_kmeans_refine_stats() -> str:
    # one Lloyd iteration as a SQL macro-expansion: assignment (rounded
    # argmax, ties to the larger cell), per-position means over the
    # 1-indexed 64-dim vectors, rounded to the same 1e-6 grid the Spark
    # side uses, empty cells inheriting the previous centroid
    def _iter(prev: str, out: str) -> str:
        return f"""
    s_{out} AS (
      SELECT e.vec_id, e.v, c.cell_id,
             ROUND(list_dot_product(e.v, c.centroid)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6)
               AS s
      FROM e CROSS JOIN {prev} c
    ), a_{out} AS (
      SELECT vec_id, v, cell_id FROM s_{out}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cell_id DESC) = 1
    ), mp_{out} AS (
      SELECT cell_id, i AS pos, AVG(v[i]) AS m
      FROM a_{out}, range(1, 65) t(i)
      GROUP BY cell_id, i
    ), m_{out} AS (
      SELECT cell_id, list(ROUND(m, 6) ORDER BY pos) AS centroid
      FROM mp_{out} GROUP BY cell_id
    ), {out} AS (
      SELECT p.cell_id, COALESCE(m.centroid, p.centroid) AS centroid
      FROM {prev} p LEFT JOIN m_{out} m USING (cell_id)
    )"""

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
                  - 1 AS INT) AS cell_id,
             v AS centroid
      FROM e
      QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 8
    ),{_iter("c0", "c1")},{_iter("c1", "c2")},
    s_f AS (
      SELECT e.vec_id, c.cell_id,
             ROUND(list_dot_product(e.v, c.centroid)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6)
               AS s
      FROM e CROSS JOIN c2 c
    ), a_f AS (
      SELECT vec_id, cell_id FROM s_f
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cell_id DESC) = 1
    ), cnt AS (SELECT cell_id, COUNT(*) AS n FROM a_f GROUP BY cell_id)
    SELECT c2.cell_id,
           CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_members,
           ROUND(sqrt(list_dot_product(c2.centroid, c2.centroid)), 6)
             AS centroid_norm
    FROM c2 LEFT JOIN cnt USING (cell_id)
    """


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment over the corpus (the md5
    draw scaled to 16 shards) + per-shard doc/token totals — the loader-
    facing manifest body of :mod:`operators.shards`. The oracle replays
    the identical draw, so shard membership itself is value-checked, not
    just the counts."""
    docs = _t(spark, sf_dir, "documents")
    return shards.shard_stats(docs, n_shards=16, seed=7).select(
        "shard_id", "n_docs", "n_tokens"
    )


def _sql_training_shards() -> str:
    return r"""
    WITH a AS (
      SELECT CAST(floor(
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|7'),
                                    1, 8)) AS BIGINT)
               / 4294967296.0 * 16) AS INT) AS shard_id,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+'))
             END AS n_tokens
      FROM documents
    )
    SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM a GROUP BY shard_id
    """


def q_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length distribution (exact continuous
    quantiles of the whitespace token count) — the profiling query behind
    every length-filter threshold choice. Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share the linear-interpolation definition,
    so values match on the 1e-6 grid. Scale note: EXACT percentile sorts
    each group's values in one task — lang groups are fine (bounded
    cardinality each side); for open-ended group keys switch to
    ``approx_percentile`` and widen the oracle to a tolerance check."""
    d = _t(spark, sf_dir, "documents")
    n = textops.token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.round(F.percentile(n, p), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.95)
        ],
    )


def _sql_corpus_quantiles() -> str:
    return r"""
    WITH a AS (
      SELECT lang,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+'))
             END AS n_tokens
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(quantile_cont(n_tokens, 0.25), 6) AS p25,
           ROUND(quantile_cont(n_tokens, 0.50), 6) AS p50,
           ROUND(quantile_cont(n_tokens, 0.75), 6) AS p75,
           ROUND(quantile_cont(n_tokens, 0.95), 6) AS p95
    FROM a GROUP BY lang
    """


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fan-out plumbing: binary payload → ≤8 sampled frames per
    doc through mapInPandas (the demux kernel is the stub seam; the slicing
    fan-out is real). Oracle: frame count and total frame bytes are pure
    byte arithmetic over the payload length (document text is ASCII, so
    octet_length(encode(text)) is exact)."""
    from embulk_input_marketo_spark.functions.multimodal import (
        sample_video_frames,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = sample_video_frames(docs, "payload", every_n=10, max_frames=8)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.octet_length("frame")).alias("frame_bytes"),
    )


def _sql_video_frame_sample() -> str:
    return """
    WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    c AS (SELECT doc_id, n, LEAST(GREATEST(n // 10, 1), 8) AS nf FROM d)
    SELECT doc_id, nf AS n_frames,
           CASE WHEN n < 10 THEN n ELSE nf * 10 END AS frame_bytes
    FROM c
    """


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal map plumbing: binary → fixed-size binary (resize). The
    deterministic fake tiles the source bytes to exactly 64×64; the oracle
    reproduces the tiling in SQL (ASCII text ⇒ byte==char) and compares
    md5 — so the binary-out contract is value-checked end to end."""
    from embulk_input_marketo_spark.functions.multimodal import resize_images

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = resize_images(docs, "payload", target_w=64, target_h=64)
    return out.select(
        "doc_id", "width", "height", F.md5("payload").alias("payload_md5")
    )


def _sql_image_resize() -> str:
    return """
    SELECT doc_id, CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           md5(left(repeat(text, 4096 // length(text) + 1), 4096))
             AS payload_md5
    FROM documents
    """


def _pgm_fixture_batches(batches):
    """numpy builder for the ``image_resize_real`` fixture: per doc an
    actual PGM (P5) image — dims (8+doc_id%5) × (6+doc_id%7), pixel i =
    (doc_id*31+i) % 256. Byte-identical to the r5 JVM-expression assembly
    (hash-compared over the full sf1.0 corpus), but the integer math runs
    vectorized instead of one interpreted format_string per pixel — the
    assembly dominated the query (guide §4.2; 7.7 s → 1.0 s for the
    fixture alone)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for dv in pdf["doc_id"]:
            dv = int(dv)
            w, h = dv % 5 + 8, dv % 7 + 6
            pix = ((dv * 31 + np.arange(w * h, dtype=np.int64)) % 256)
            out.append(
                f"P5\n{w} {h}\n255\n".encode() + pix.astype(np.uint8).tobytes()
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def q_image_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode→resize→re-encode (no deterministic fake): each doc
    becomes an actual PGM (P5) image (:func:`_pgm_fixture_batches` — an
    independent builder whose bytes the kernel has no visibility into),
    then the mapInPandas kernel PARSES the PGM bytes
    (:mod:`functions.imagecodec`), nearest-neighbor-resizes to 16×16 with
    the exact integer map src=(dst*extent)//16, and re-encodes canonical
    P5. The oracle rebuilds the expected output bytes analytically from
    the same pixel formula + index map, so the decoder, the resampler and
    the encoder are all value-checked byte-for-byte (hex compare).
    r4 VERDICT item 3: the codec seam, made real."""
    from embulk_input_marketo_spark.functions.multimodal import resize_images

    fixture = _spread(
        _t(spark, sf_dir, "documents").select("doc_id")
    ).mapInPandas(_pgm_fixture_batches, "doc_id long, payload binary")
    out = resize_images(
        fixture, "payload", target_w=16, target_h=16, deterministic_fake=False
    )
    return out.select(
        "doc_id", "width", "height", F.hex("payload").alias("payload_hex")
    )


def _sql_image_resize_real() -> str:
    # expected resized pixel (y,x) = src pixel at ((y*h)//16, (x*w)//16),
    # value (doc_id*31 + sy*w + sx) % 256; canonical P5 header + raw bytes
    return """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 7 AS h FROM documents
    ), px AS (
      SELECT d.doc_id, y.y, x.x,
             (d.doc_id*31 + ((y.y*d.h)//16)*d.w + (x.x*d.w)//16) % 256 AS val
      FROM d, range(0, 16) y(y), range(0, 16) x(x)
    ), hx AS (
      SELECT doc_id, string_agg(printf('%02x', val), '' ORDER BY y, x) AS pix
      FROM px GROUP BY doc_id
    )
    SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           hex(encode('P5' || chr(10) || '16 16' || chr(10) || '255'
                      || chr(10)) || unhex(pix)) AS payload_hex
    FROM hx
    """


def _wav_fixture_batches(batches):
    """numpy builder for the ``audio_stats_real`` fixture: per doc an
    actual mono 16-bit PCM RIFF/WAVE — rate 16 kHz, n = 64+doc_id%32
    frames, stored u16 sample i = ((doc_id*7 + i*13) % 65536 + 32768)
    % 65536 little-endian (the two's-complement encoding of signed
    s = u - 32768). Byte-identical to the r5 JVM-expression assembly
    (hash-compared over the full sf1.0 corpus); the hex-per-sample
    format_string transform it replaces was ~2/3 of the query's wall
    time (guide §4.2)."""
    import numpy as np
    import pandas as pd

    fmt_chunk = bytes.fromhex(
        "666d7420"            # "fmt "
        "10000000"            # chunk len 16
        "0100" "0100"         # PCM, 1 channel
        "803e0000"            # rate 16000
        "007d0000"            # byte rate 32000
        "0200" "1000"         # block align 2, bits 16
    )
    for pdf in batches:
        out = []
        for dv in pdf["doc_id"]:
            dv = int(dv)
            n = dv % 32 + 64
            u = (dv * 7 + np.arange(n, dtype=np.int64) * 13) % 65536
            data = ((u + 32768) % 65536).astype("<u2").tobytes()
            out.append(
                b"RIFF" + (n * 2 + 36).to_bytes(4, "little") + b"WAVE"
                + fmt_chunk
                + b"data" + (n * 2).to_bytes(4, "little") + data
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def q_audio_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (no fake): each doc becomes an actual mono 16-bit
    PCM WAV — rate 16 kHz, n = 64+doc_id%32 frames, signed sample i =
    ((doc_id*7 + i*13) % 65536) - 32768 — built byte-exactly by an
    independent builder (:func:`_wav_fixture_batches`: RIFF/fmt/data
    chunks, little-endian fields, two's-complement sample encoding), then
    PARSED by the mapInPandas kernel (:mod:`functions.audiocodec`) into
    integer-exact stats. The oracle recomputes every stat analytically
    from the same sample formula, so the chunk walker, the PCM decode and
    the stats fold are all value-checked. The audio sibling of
    ``image_resize_real``."""
    from embulk_input_marketo_spark.functions.multimodal import (
        decode_audio_stats,
    )

    fixture = _spread(
        _t(spark, sf_dir, "documents").select("doc_id")
    ).mapInPandas(_wav_fixture_batches, "doc_id long, payload binary")
    return decode_audio_stats(fixture, "payload")


def _sql_audio_stats_real() -> str:
    return """
    WITH d AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
    s AS (
      SELECT d.doc_id, d.n,
             ABS(((d.doc_id*7 + i.i*13) % 65536) - 32768) AS a
      FROM d, range(0, 96) i(i) WHERE i.i < d.n
    )
    SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_frames,
           CAST(16000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(MAX(n)*1000 // 16000 AS BIGINT) AS duration_ms,
           CAST(MAX(a) AS BIGINT) AS peak,
           CAST(SUM(a) AS BIGINT) AS sum_abs
    FROM s GROUP BY doc_id
    """


def q_invalid_record_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-record row filter with side output (P8): events whose props
    fail to parse are rejected; the query returns per-type counts of valid
    vs rejected (rejects carry a 'reasons' marker)."""
    from embulk_input_marketo_spark.operators.sanitize import split_valid_invalid

    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    flagged = ev.withColumn(
        "reasons",
        F.when(k.isNull(), F.lit("missing k"))
        .when(k >= 90, F.lit("k out of range"))
        .otherwise(F.lit(None)),
    )
    valid, rejects = split_valid_invalid(flagged)
    # full outer: an event_type whose rows are ALL rejected must still appear
    # (with n_valid=0), exactly like the oracle's GROUP BY (ADVICE round 1)
    return (
        valid.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_valid"))
        .join(
            rejects.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rejected")),
            on="event_type", how="full_outer",
        )
        .select(
            "event_type",
            F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
            F.coalesce("n_rejected", F.lit(0)).alias("n_rejected"),
        )
    )


def _sql_invalid_record_filter() -> str:
    return """
    WITH f AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) FILTER (WHERE k IS NOT NULL AND k < 90) AS n_valid,
           COUNT(*) FILTER (WHERE k IS NULL OR k >= 90) AS n_rejected
    FROM f GROUP BY event_type
    """


def q_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mock preview source (S10): 15 deterministic typed rows — the
    `embulk preview` analogue (MarketoUtils.importMockPreviewData:224-271)."""
    from embulk_input_marketo_spark.sources.paginated import preview_rows

    return preview_rows(spark, 15).select(
        "lsn", "op", "url", "warc_ts",
        F.length("html").alias("html_bytes"), "text", "lang",
    )


def _sql_preview() -> str:
    return """
    SELECT i AS lsn, 'I' AS op,
           'https://preview.example/' || CAST(i AS VARCHAR) AS url,
           TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 SECOND AS warc_ts,
           octet_length(encode('<html><body>preview ' || CAST(i AS VARCHAR)
                               || '</body></html>')) AS html_bytes,
           'preview ' || CAST(i AS VARCHAR) AS text, 'en' AS lang
    FROM range(15) t(i)
    """


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document content fingerprints (JVM xxhash64, whole-stage
    codegen — round 1's per-byte-Python FNV loop is gone). Oracle: the
    fingerprint-group-size histogram must equal the text-group-size
    histogram (xxhash64 is injective on the fixture)."""
    docs = _docs_with_copies(spark, sf_dir)
    fp = docs.select(textops.fingerprint64("text").alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


def _sql_fingerprints() -> str:
    return """
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    ), g AS (SELECT COUNT(*) AS n_docs FROM docs GROUP BY text)
    SELECT n_docs, COUNT(*) AS n_groups FROM g GROUP BY n_docs
    """


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (MOSS scheme) end-to-end: exact
    duplicate docs must have IDENTICAL fingerprint sets, so the fingerprint
    Jaccard of every known (original, copy) pair is exactly 1.0 — a checkable
    contract for the whole k-gram-hash → window-min → distinct pipeline.
    Partial-overlap discrimination is pinned in tests/test_dedup_and_text.py."""
    docs = _docs_with_copies(spark, sf_dir)
    fps = textops.winnow_fingerprints(docs, k=4, window=3)
    a = fps.where(F.col("doc_id") < 100000).where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("left_id"), F.col("fingerprints").alias("_fa")
    )
    b = fps.where(F.col("doc_id") >= 100000).select(
        (F.col("doc_id") - 100000).alias("left_id"),
        F.col("doc_id").alias("right_id"),
        F.col("fingerprints").alias("_fb"),
    )
    return (
        a.join(b, "left_id")
        .select(
            "left_id",
            "right_id",
            F.round(
                F.size(F.array_intersect("_fa", "_fb"))
                / F.size(F.array_union("_fa", "_fb")),
                6,
            ).cast("double").alias("fp_jaccard"),
        )
    )


def _sql_winnow_fingerprints() -> str:
    return """
    SELECT doc_id AS left_id, doc_id + 100000 AS right_id,
           CAST(1.0 AS DOUBLE) AS fp_jaccard
    FROM documents WHERE doc_id % 10 = 0
    """


# ---------------------------------------------------------------------------
# temporal operators (as-of join, sessionization) and URL canonicalization
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed as-of join: each event picks the latest order (per user,
    order dates deterministically shifted into the event month) at-or-before
    its timestamp.  Single-shuffle union-scan plan (operators/temporal.py);
    the oracle is an INDEPENDENT formulation — a correlated scalar subquery
    with ORDER BY … LIMIT 1 — not a SQL transliteration of the same plan."""
    from embulk_input_marketo_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    # shift o_orderdate (1995-2001) into the events month: same instant
    # arithmetic on both sides (2024-01-01 UTC == epoch 1704067200). Parquet
    # timestamps load as TIMESTAMP_NTZ in Spark 4 → route epoch seconds
    # through the UTC session zone, and keep rts NTZ so it unions cleanly
    # with the NTZ event ts inside asof_join
    rts = F.timestamp_seconds(
        F.lit(1704067200)
        + F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
        % F.lit(30 * 86400)
    ).cast("timestamp_ntz")
    r0 = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        rts.alias("rts"),
        F.col("o_totalprice").alias("asof_price"),
        "o_orderkey",
    )
    # only keys that can match: broadcast semi-join against the (small)
    # distinct key set — at 100 TB this prunes the dimension scan early
    users = ev.select("user_id").distinct()
    r0 = r0.join(F.broadcast(users), "user_id", "leftsemi")
    # one row per (key, rts): largest orderkey wins — same tiebreak as the
    # oracle's row_number, and it makes the as-of pick deterministic
    right = lww_dedup(
        r0, key_cols=["user_id", "rts"], order_cols=["o_orderkey"]
    ).drop("o_orderkey")
    out = asof_join(
        ev, right, on="user_id", left_ts="ts", right_ts="rts",
        payload_cols=["asof_price"],
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "asof_price",
        F.col("asof_matched_ts").alias("asof_ts"),
    )


def _sql_asof_join() -> str:
    return """
    WITH r0 AS (
      SELECT o_custkey AS user_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch(o_orderdate)) AS BIGINT) % 2592000)
               AS rts,
             o_totalprice AS price, o_orderkey
      FROM orders
      WHERE o_custkey IN (SELECT DISTINCT user_id FROM events)
    ), r AS (
      SELECT user_id, rts, price FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, rts
                                     ORDER BY o_orderkey DESC) AS rn
        FROM r0
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
      (SELECT r.price FROM r WHERE r.user_id = e.user_id AND r.rts <= e.ts
       ORDER BY r.rts DESC LIMIT 1) AS asof_price,
      (SELECT r.rts FROM r WHERE r.user_id = e.user_id AND r.rts <= e.ts
       ORDER BY r.rts DESC LIMIT 1) AS asof_ts
    FROM events e
    """


def q_asof_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-safe split as-of join (two-level time-bucket scan, no
    task holds one key's whole history) on the same inputs as `asof_join` —
    row-identical by construction, checked against the same independent
    correlated-subquery oracle."""
    from embulk_input_marketo_spark.operators.temporal import asof_join_split

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    rts = F.timestamp_seconds(
        F.lit(1704067200)
        + F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
        % F.lit(30 * 86400)
    ).cast("timestamp_ntz")
    r0 = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        rts.alias("rts"),
        F.col("o_totalprice").alias("asof_price"),
        "o_orderkey",
    )
    users = ev.select("user_id").distinct()
    r0 = r0.join(F.broadcast(users), "user_id", "leftsemi")
    right = lww_dedup(
        r0, key_cols=["user_id", "rts"], order_cols=["o_orderkey"]
    ).drop("o_orderkey")
    out = asof_join_split(
        ev, right, on="user_id", left_ts="ts", right_ts="rts",
        payload_cols=["asof_price"], split_every_sec=7 * 86400,
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "asof_price",
        F.col("asof_matched_ts").alias("asof_ts"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (12h gap) + per-session rollup: lag-flag and
    running-sum share one window spec, so the whole operator is one shuffle
    and one sort; the rollup's partial aggregation rides the same keys."""
    from embulk_input_marketo_spark.operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    s = sessionize(ev, "user_id", "ts", gap_sec=43200, order_tiebreak="event_id")
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        # exact decimal sum internally, DOUBLE across the gate (see
        # q_checkpoint_rollup — decimal is the unstable transport type)
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


def _sql_sessionize() -> str:
    return """
    WITH flag AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN lag(ts) OVER w IS NULL
              OR CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 43200
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS session_seq
      FROM flag
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      CAST(count(*) AS BIGINT) AS n_events,
      min(ts) AS session_start, max(ts) AS session_end,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_seq
    """


def q_sessionize_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe sessionization (local sessions per (key, time-bucket) +
    O(buckets) boundary merge) — same rollup and the same oracle as
    `sessionize`; the numbering is proven identical by construction and by
    pytest row-identity."""
    from embulk_input_marketo_spark.operators.temporal import sessionize_split

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    s = sessionize_split(
        ev, "user_id", "ts", gap_sec=43200, split_every_sec=43200,
        order_tiebreak="event_id",
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        # exact decimal sum internally, DOUBLE across the gate (see
        # q_checkpoint_rollup — decimal is the unstable transport type)
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


def q_token_frequency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram corpus-frequency scoring per document (integer-exact LM
    quality signal): see textops.token_frequency_stats."""
    d = _t(spark, sf_dir, "documents")
    return textops.token_frequency_stats(
        _spread(d.select("doc_id", "text")), "text", "doc_id", rare_max=2
    )


def _sql_token_frequency_stats() -> str:
    return r"""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS w
        FROM documents) WHERE w <> ''
    ), vocab AS (SELECT w, COUNT(*) AS n FROM words GROUP BY w)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.n <= 2) AS BIGINT) AS n_rare,
           CAST(MIN(v.n) AS BIGINT) AS min_freq,
           ROUND(CAST(SUM(v.n) AS DOUBLE) / COUNT(*), 6) AS avg_freq,
           ROUND(CAST(COUNT(*) FILTER (WHERE v.n <= 2) AS DOUBLE)
                 / COUNT(*), 6) AS rare_ratio
    FROM words JOIN vocab v USING (w)
    GROUP BY doc_id
    """


def q_boilerplate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-passage detection (CCNet/RefinedWeb-style
    boilerplate removal primitive): per doc, its distinct 5-word shingles
    appearing in ≥3 distinct documents. Non-vacuous by construction: every
    10th doc gets the same planted header, so its shingles cross the
    threshold (10% of the corpus shares them) while organic shingles stay
    (nearly) unique."""
    from embulk_input_marketo_spark.operators.dedup_docs import (
        boilerplate_shingles,
    )

    d = _t(spark, sf_dir, "documents")
    fixture = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.lit("shared boilerplate header follows the content "),
                F.col("text"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return boilerplate_shingles(
        fixture, text_col="text", id_col="doc_id", shingle_n=5, min_docs=3
    )


def _sql_boilerplate_passages() -> str:
    return r"""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN 'shared boilerplate header follows the content ' || text
                  ELSE text END AS text
      FROM documents
    ), docs AS (
      SELECT doc_id,
             string_split(regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g'),
                          ' ') AS w
      FROM raw
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 3),
                                 i -> array_to_string(list_slice(w, i, i + 4),
                                                      ' ')) END) AS g
      FROM docs
    ), pairs AS (SELECT DISTINCT doc_id, g FROM sh),
    freq AS (SELECT g, COUNT(*) AS df FROM pairs GROUP BY g)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE f.df >= 3) AS BIGINT) AS n_boilerplate,
           ROUND(CAST(COUNT(*) FILTER (WHERE f.df >= 3) AS DOUBLE)
                 / COUNT(*), 6) AS boilerplate_frac
    FROM pairs p JOIN freq f USING (g)
    GROUP BY p.doc_id
    """


_RRL_BANNER = "We use cookies to improve your experience - accept all cookies"
_RRL_FOOTER = "Copyright 2026 Example Corp - all rights reserved"


def q_remove_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-line removal (the FineWeb/CCNet line-dedup APPLY stage):
    strip lines occurring in ≥3 distinct docs, keep the rest in order.
    Fixture plants a cookie banner on every 5th doc (twice on every 50th —
    instance-count removal), a copyright footer on every 3rd, and a
    whitespace-only trailing line on EVERY doc that must survive (blank
    lines are structure, not boilerplate, regardless of frequency)."""
    from embulk_input_marketo_spark.operators.dedup_docs import (
        remove_repeated_lines,
    )

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    fixture = d.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 5 == 0, F.lit(_RRL_BANNER + "\n"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 50 == 0, F.lit("\n" + _RRL_BANNER))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\n" + _RRL_FOOTER))
            .otherwise(F.lit("")),
            F.lit("\n   "),
        ).alias("text"),
    )
    return remove_repeated_lines(
        fixture, text_col="text", id_col="doc_id", min_docs=3
    )


def _sql_remove_repeated_lines() -> str:
    return rf"""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN '{_RRL_BANNER}' || chr(10) ELSE '' END
             || text
             || CASE WHEN doc_id % 50 = 0
                     THEN chr(10) || '{_RRL_BANNER}' ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || '{_RRL_FOOTER}' ELSE '' END
             || chr(10) || '   ' AS text
      FROM documents
    ), split AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM raw
    ), lines AS (
      SELECT doc_id, unnest(range(len(ls))) AS pos, unnest(ls) AS line
      FROM split
    ), normed AS (
      SELECT doc_id, pos, line,
             regexp_replace(TRIM(lower(line)), '\s+', ' ', 'g') AS norm
      FROM lines
    ), flagged AS (
      SELECT norm FROM normed
      WHERE length(norm) >= 1
      GROUP BY norm HAVING COUNT(DISTINCT doc_id) >= 3
    ), marked AS (
      SELECT n.doc_id, n.pos, n.line,
             length(n.norm) >= 1
             AND n.norm IN (SELECT norm FROM flagged) AS rm
      FROM normed n
    )
    SELECT doc_id,
           COALESCE(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE NOT rm), '') AS clean_text,
           CAST(COUNT(*) AS INT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE rm) AS BIGINT) AS n_removed
    FROM marked
    GROUP BY doc_id
    """


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Gopher-rules quality family):
    duplicate-word fraction + most-common-bigram mass per doc."""
    d = _t(spark, sf_dir, "documents")
    return textops.doc_repetition(d, text_col="text", id_col="doc_id")


def _sql_doc_repetition() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id,
             string_split(regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g'),
                          ' ') AS w
      FROM documents
    ), stats AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words
      FROM docs
    ), bi AS (
      SELECT doc_id, unnest(
        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i + 1]) END) AS g
      FROM docs
    ), bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY 1, 2),
    ba AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n,
                  CAST(SUM(c) AS BIGINT) AS n_bigrams FROM bc GROUP BY 1)
    SELECT s.doc_id, s.n_words, s.n_distinct_words, b.top_bigram_n,
           b.n_bigrams,
           ROUND(1 - CAST(s.n_distinct_words AS DOUBLE) / s.n_words, 6)
             AS dup_word_frac,
           ROUND(CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams, 6)
             AS top_bigram_frac
    FROM stats s JOIN ba b USING (doc_id)
    """


_CANARY = "benchmark canary passage alpha beta gamma delta epsilon"


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-language context-window bins of 2048 tokens,
    greedy fill in doc_id order — the training-batch assembly step."""
    from embulk_input_marketo_spark.operators.sampling import pack_documents

    d = _t(spark, sf_dir, "documents")
    return pack_documents(
        d, budget_tokens=2048, strata_col="lang"
    )


def _sql_pack_documents() -> str:
    return r"""
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
               AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(
             (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n_tokens)
             / 2048.0) AS BIGINT) AS bin_id
    FROM toks
    """


def q_pack_documents_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The giant-stratum-safe packing variant: same bins as pack_documents
    (and the same independent oracle), but computed via order-preserving id
    buckets + carry-in offsets so no task holds a whole stratum.
    ids_per_bucket is set low here to force MANY buckets at fixture scale —
    the carry-merge path is fully exercised, not vacuously single-bucket."""
    from embulk_input_marketo_spark.operators.sampling import (
        pack_documents_split,
    )

    d = _t(spark, sf_dir, "documents")
    return pack_documents_split(
        d, budget_tokens=2048, strata_col="lang", ids_per_bucket=100
    )


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage detection: docs < 10 are the 'benchmark'; every
    17th corpus doc has a benchmark passage planted into it (the canary), so
    the overlap counter provably fires on exactly those — organic 5-shingle
    collisions between random word-bags are ~0."""
    from embulk_input_marketo_spark.operators.dedup_docs import (
        contamination_check,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") < 10).select(
        "doc_id", F.concat(F.col("text"), F.lit(" " + _CANARY)).alias("text")
    )
    corpus = d.where(F.col("doc_id") >= 10).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(F.col("text"), F.lit(" " + _CANARY)),
        ).otherwise(F.col("text")).alias("text"),
    )
    return contamination_check(corpus, bench)


def _sql_contamination_check() -> str:
    return r"""
    WITH bench_raw AS (
      SELECT doc_id,
             text || ' benchmark canary passage alpha beta gamma delta epsilon'
               AS text
      FROM documents WHERE doc_id < 10
    ), corpus_raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0
                  THEN text || ' benchmark canary passage alpha beta gamma delta epsilon'
                  ELSE text END AS text
      FROM documents WHERE doc_id >= 10
    ), bench_sh AS (
      SELECT DISTINCT g FROM (
        SELECT unnest(
          CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w) - 3),
                    i -> array_to_string(list_slice(w, i, i + 4), ' ')) END) AS g
        FROM (SELECT string_split(regexp_replace(TRIM(lower(text)),
                                                 '\s+', ' ', 'g'), ' ') AS w
              FROM bench_raw))
    ), corpus_sh AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w) - 3),
                    i -> array_to_string(list_slice(w, i, i + 4), ' ')) END) AS g
        FROM (SELECT doc_id,
                     string_split(regexp_replace(TRIM(lower(text)),
                                                 '\s+', ' ', 'g'), ' ') AS w
              FROM corpus_raw))
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(b.g) AS BIGINT) AS n_contaminated,
           ROUND(CAST(COUNT(b.g) AS DOUBLE) / COUNT(*), 6)
             AS contamination_frac
    FROM corpus_sh c LEFT JOIN bench_sh b ON c.g = b.g
    GROUP BY c.doc_id
    """


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling (training-corpus mixing): en
    down-weighted, zh up-weighted, everything else at the default rate. The
    draw is a pure function of (doc_id, seed) via md5 — the oracle computes
    the IDENTICAL draw, so the sampled sets match row-for-row."""
    from embulk_input_marketo_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d, strata_col="lang",
        rates={"en": 0.25, "zh": 0.9}, default_rate=0.5,
        key_col="doc_id", seed=7,
    )
    return out.select("doc_id", "lang", "source")


def q_assign_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment over the corpus — one
    codegen'd CASE on the shared (key, seed) md5 draw, no shuffle. Band
    edges 0.75/0.875 are exactly representable in binary64, so the oracle's
    literals are the identical doubles and membership matches bit-for-bit."""
    from embulk_input_marketo_spark.operators.sampling import assign_split

    d = _t(spark, sf_dir, "documents")
    return assign_split(
        d, {"train": 0.75, "valid": 0.125, "test": 0.125},
        key_col="doc_id", seed=7,
    ).select("doc_id", "lang", "split")


def _sql_assign_split() -> str:
    return """
    SELECT doc_id, lang,
           CASE WHEN d < 0.75 THEN 'train'
                WHEN d < 0.875 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 8))
                  AS BIGINT) / 4294967296.0 AS d
      FROM documents
    )
    """


def q_sample_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language sampling (the fixed-count face of corpus
    mixing — eval-set assembly). Two-stage bounded top-k: no task ever
    sorts a whole language; the oracle is a single QUALIFY-style
    row_number over the IDENTICAL integer draw, equivalent because any
    global top-k row is its own salt-bucket's top-k."""
    from embulk_input_marketo_spark.operators.sampling import (
        sample_k_per_stratum,
    )

    d = _t(spark, sf_dir, "documents")
    return sample_k_per_stratum(
        d, strata_col="lang", k=25, key_col="doc_id", seed=7
    )


def _sql_sample_k_per_stratum() -> str:
    return """
    SELECT lang, doc_id, rn AS sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substr(
                          md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 8))
                        AS BIGINT),
                        doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 25
    """


def _sql_stratified_sample() -> str:
    return """
    SELECT doc_id, lang, source FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 8))
               AS BIGINT) / 4294967296.0
          < CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.9 ELSE 0.5 END
    """


def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 words: explode → map-side-combined count → rank,
    ties broken lexically. The exact baseline of the heavy-hitters family
    (corpus vocabulary statistics). Scale note: the rank window holds one
    LANGUAGE'S (word, count) rows per task — vocabulary-sized (millions),
    not corpus-sized; the heavy explode+count stage is a plain map-side
    combined aggregate."""
    from pyspark.sql import Window

    # (r6: _spread A/B'd SLOWER here — 0.7 s -> 1.1 s: the explode feeds a
    # map-side combined aggregate whose single-task cost is below the extra
    # exchange; left on the scan)
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
    )


def _sql_top_words() -> str:
    return """
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS n FROM words
      WHERE word <> '' GROUP BY lang, word
    ), ranked AS (
      SELECT lang, word, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
      FROM counts
    )
    SELECT lang, word, n, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= 5
    """


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (functions/urlops.py): deterministic messy URLs
    synthesized from doc_id (mixed-case scheme/host, default and non-default
    ports, utm_*/fbclid tracking params, fragments) → normalized form + host.
    Whole chain is JVM regexp expressions, no UDF."""
    from embulk_input_marketo_spark.functions import urlops

    d = F.col("doc_id")

    def m(n: int):
        return (d % n).cast("string")

    scheme = (
        F.when(d % 3 == 0, F.lit("HTTP"))
        .when(d % 3 == 1, F.lit("https"))
        .otherwise(F.lit("HTTPS"))
    )
    port = (
        F.when(d % 4 == 0, F.lit(":80"))
        .when(d % 4 == 1, F.lit(":443"))
        .when(d % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    qs = (
        F.when(d % 3 == 0, F.concat(F.lit("?utm_source=tw&q="), m(7),
                                    F.lit("&utm_medium=x")))
        .when(d % 3 == 1, F.concat(F.lit("?q="), m(7), F.lit("&fbclid=abc")))
        .otherwise(F.lit("?utm_campaign=only"))
    )
    frag = F.when(d % 2 == 0, F.lit("#Sec1")).otherwise(F.lit(""))
    raw = F.concat(
        scheme, F.lit("://WWW.Site-"), m(40), F.lit(".ExAmple.COM"), port,
        F.lit("/A/b"), m(5), qs, frag,
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", raw.alias("url_raw"))
    out = docs.withColumn("url_norm", urlops.normalize_url(F.col("url_raw")))
    return out.withColumn("host", urlops.url_host(F.col("url_norm")))


def _sql_url_normalize() -> str:
    return r"""
    WITH raw AS (
      SELECT doc_id,
        (CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
              ELSE 'HTTPS' END)
        || '://WWW.Site-' || (doc_id % 40) || '.ExAmple.COM'
        || (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                 WHEN 2 THEN ':8080' ELSE '' END)
        || '/A/b' || (doc_id % 5)
        || (CASE doc_id % 3
              WHEN 0 THEN '?utm_source=tw&q=' || (doc_id % 7) || '&utm_medium=x'
              WHEN 1 THEN '?q=' || (doc_id % 7) || '&fbclid=abc'
              ELSE '?utm_campaign=only' END)
        || (CASE doc_id % 2 WHEN 0 THEN '#Sec1' ELSE '' END) AS url_raw
      FROM documents
    ),
    s1 AS (SELECT doc_id, url_raw,
                  regexp_replace(url_raw, '#.*$', '') AS u FROM raw),
    s2 AS (SELECT doc_id, url_raw,
            lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
            || substr(u, length(regexp_extract(u,
                 '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) + 1) AS u
           FROM s1),
    s3 AS (SELECT doc_id, url_raw,
            regexp_replace(
              regexp_replace(u, '^(http://[^/?#:]*):80($|[/?#])', '\1\2'),
              '^(https://[^/?#:]*):443($|[/?#])', '\1\2') AS u FROM s2),
    s4 AS (SELECT doc_id, url_raw,
            regexp_replace(u, '^([a-z][a-z0-9+.-]*://)www\.', '\1') AS u
           FROM s3),
    s5 AS (SELECT doc_id, url_raw,
            regexp_replace(
              regexp_replace(
                regexp_replace(u, '(?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&',
                               '', 'g'),
                '[?&](?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*$', ''),
              '\?&', '?') AS u FROM s4)
    SELECT doc_id, url_raw, u AS url_norm,
           regexp_extract(u, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host
    FROM s5
    """


def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over an organic similarity graph: the unigram
    Jaccard > 0.2 pairs among the first 40 docs (same pair set as
    ngram_jaccard_matrix) resolved into components by the distributed
    large-star/small-star pass. The oracle recomputes the identical pair set
    in SQL and takes min-reachable-id per node via a recursive CTE — an
    INDEPENDENT transitive closure, so label propagation bugs (not just
    pair bugs) are caught."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 40
    )
    a = docs.select(F.col("doc_id").alias("left_id"))
    b = docs.select(F.col("doc_id").alias("right_id"))
    cand = a.crossJoin(b).where(F.col("left_id") < F.col("right_id"))
    pairs = dedup_docs.ngram_jaccard(cand, docs, n=1, threshold=0.0).where(
        F.col("jaccard") > 0.2
    )
    return dedup_docs.near_dup_components(pairs)


def _sql_near_dup_components() -> str:
    return r"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id < 40
    ), grams_d AS (SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(string_split(t, ' ')) AS g FROM docs)
    ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams_d GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS i
      FROM grams_d a JOIN grams_d b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT i.left_id, i.right_id
      FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
      JOIN sizes sb ON sb.doc_id = i.right_id
      WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) > 0.2
    ), edges AS (
      SELECT left_id AS u, right_id AS v FROM pairs
      UNION
      SELECT right_id, left_id FROM pairs
    ), reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
    )
    SELECT CAST(u AS BIGINT) AS doc_id,
           CAST(MIN(r) AS BIGINT) AS component_id
    FROM reach GROUP BY u
    """


def q_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete dedup pipeline end-to-end: MinHash→LSH candidates →
    exact Jaccard verify (0.999 ⇒ exactly the planted copy pairs) →
    connected components → min-id survivor per group, singletons kept. The
    oracle derives the same answer from first principles: normalized-text
    equality groups with min(doc_id) as the label."""
    docs = _docs_with_copies(spark, sf_dir)
    cand = dedup_docs.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, shingle_n=3
    )
    verified = dedup_docs.ngram_jaccard(cand, docs, n=3, threshold=0.999)
    return dedup_docs.near_dup_survivors(
        docs, verified.select("left_id", "right_id")
    )


def _sql_near_dup_survivors() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
      SELECT doc_id, regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM docs
    ), comp AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY t) AS component_id
      FROM norm
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(component_id AS BIGINT) AS component_id,
           doc_id = component_id AS keep
    FROM comp
    """


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family document quality rules (word-count bounds, mean word
    length, alpha-word fraction, symbol ratio, stopword floor) — the
    heuristic filter stack of MassiveWeb-style corpus cleaning, per-rule
    flags plus the conjunction. All JVM expressions; the oracle recomputes
    every rule from the raw text."""
    # r6: staged form — raw counts once behind a barrier, flags from
    # attributes (textops.gopher_quality_stats docstring; the dict form
    # re-ran the interpreted word-filter HOF and token_count per output)
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return textops.gopher_quality_stats(
        docs, min_words=10, max_words=100_000
    )


def _sql_gopher_quality() -> str:
    return r"""
    WITH b AS (
      SELECT doc_id, TRIM(text) AS t,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
               AS n_words
      FROM documents
    ), m AS (
      SELECT doc_id, n_words,
             CAST(length(regexp_replace(t, '\s+', '', 'g')) AS DOUBLE)
               / GREATEST(n_words, 1) AS mean_wl,
             CAST(len(list_filter(regexp_split_to_array(t, '\s+'),
                                  w -> regexp_matches(w, '[A-Za-z]')))
                  AS DOUBLE) / GREATEST(n_words, 1) AS alpha_frac,
             CAST(len(regexp_extract_all(t, '\.\.\.|#')) AS DOUBLE)
               / GREATEST(n_words, 1) AS sym_ratio,
             CAST(len(regexp_split_to_array(lower(t),
                      '\b(the|and|of|to|a)\b')) - 1 AS BIGINT) AS hits
      FROM b
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(mean_wl, 6) AS mean_word_len,
           ROUND(alpha_frac, 6) AS alpha_word_frac,
           ROUND(sym_ratio, 6) AS symbol_ratio,
           hits AS stopword_hits,
           (n_words >= 10 AND n_words <= 100000
            AND mean_wl >= 3.0 AND mean_wl <= 10.0
            AND alpha_frac >= 0.8 AND sym_ratio <= 0.1
            AND hits >= 2) AS keep
    FROM m
    """


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bag-of-words linear classifier scoring (the fasttext/DCLM
    quality-classifier pass): md5-derived integer token weights summed per
    document, normalized into [-1, 1]. Integer-exact until one final
    division, so the oracle reproduces the score bit-for-bit."""
    # r6: staged form — the md5-per-token fold runs once behind a barrier
    # instead of once per output column (textops.hashed_classifier_stats)
    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return textops.hashed_classifier_stats(docs)


def _sql_quality_classifier() -> str:
    return r"""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
               AS n_words,
             CAST(list_sum(list_transform(
                    regexp_split_to_array(TRIM(text), '\s+'),
                    t -> CAST(('0x' || substr(md5(t || '|w7'), 1, 4))
                              AS BIGINT) % 1001 - 500)) AS BIGINT) AS wsum
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           wsum AS weight_sum,
           ROUND(CAST(wsum AS DOUBLE)
                 / (CAST(500 AS DOUBLE)
                    * CAST(GREATEST(n_words, 1) AS DOUBLE)), 6) AS clf_score,
           (CAST(wsum AS DOUBLE)
            / (CAST(500 AS DOUBLE)
               * CAST(GREATEST(n_words, 1) AS DOUBLE)) > 0) AS clf_label
    FROM w
    """


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling over sources: src0 weighted 2, src1
    and src2 weighted 1, src3 dropped, against a 5000-token budget. The
    per-source keep-rate derives from the corpus's own token totals; the
    per-doc draw is the engine-independent md5 draw."""
    from embulk_input_marketo_spark.operators.sampling import corpus_mix

    d = _t(spark, sf_dir, "documents")
    return corpus_mix(
        d, weights={"src0": 2.0, "src1": 1.0, "src2": 1.0},
        budget_tokens=5000, source_col="source", key_col="doc_id",
        text_col="text", seed=42,
    )


def _sql_corpus_mix() -> str:
    return r"""
    WITH tok AS (
      SELECT doc_id, source,
             CASE WHEN TRIM(text) = '' THEN 0
                  ELSE CAST(len(regexp_split_to_array(TRIM(text), '\s+'))
                       AS BIGINT) END AS n_tokens
      FROM documents
    ), tot AS (
      SELECT source, SUM(n_tokens) AS tot FROM tok GROUP BY source
    ), j AS (
      SELECT t.doc_id, t.source, t.n_tokens,
             LEAST(CAST(1.0 AS DOUBLE),
                   CAST(CASE t.source WHEN 'src0' THEN 2500.0
                                      WHEN 'src1' THEN 1250.0
                                      WHEN 'src2' THEN 1250.0
                                      ELSE 0.0 END AS DOUBLE)
                   / CAST(tot AS DOUBLE)) AS rate
      FROM tok t JOIN tot USING (source)
    )
    SELECT doc_id, source, n_tokens, ROUND(rate, 6) AS rate
    FROM j
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 8))
               AS BIGINT) / 4294967296.0 < rate
    """


def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's terminal apply: MinHash→LSH candidates → exact
    3-gram Jaccard verify → components → survivors → THE KEPT CORPUS (the
    rows that ship to tokenization). The oracle derives the same kept set
    from normalized-text equality groups."""
    docs = _docs_with_copies(spark, sf_dir)
    cand = dedup_docs.minhash_lsh_pairs(
        docs, num_hashes=32, bands=8, shingle_n=3
    )
    verified = dedup_docs.ngram_jaccard(cand, docs, n=3, threshold=0.999)
    kept = dedup_docs.apply_dedup(
        docs, verified.select("left_id", "right_id")
    )
    return kept.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _sql_dedup_apply() -> str:
    return r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
    ), norm AS (
      SELECT doc_id, text,
             regexp_replace(TRIM(lower(text)), '\s+', ' ', 'g') AS t
      FROM docs
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM (SELECT doc_id, text,
                 MIN(doc_id) OVER (PARTITION BY t) AS component_id
          FROM norm)
    WHERE doc_id = component_id
    """


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys (functions/zorder.py): the 64-bit Morton
    interleave of two document dimensions — pure shift/mask longs, fully
    codegen. The oracle replays the identical 5-step bit-spreading chain
    in SQL integer arithmetic, so the layout key is engine-independent."""
    from embulk_input_marketo_spark.functions import zorder

    docs = _t(spark, sf_dir, "documents")
    a = zorder.dim_from_long("doc_id")
    b = zorder.dim_from_long("n_chars")
    return docs.select(
        "doc_id", zorder.zorder_key(a, b).alias("zkey")
    )


def _sql_zorder_layout() -> str:
    def spread(e: str) -> str:
        s = f"(({e}) & 4294967295)"
        for sh, mask in [
            (16, 281470681808895),
            (8, 71777214294589695),
            (4, 1085102592571150095),
            (2, 3689348814741910323),
            (1, 6148914691236517205),
        ]:
            s = f"((({s}) | (({s}) << {sh})) & {mask})"
        return s

    def dim(e: str) -> str:
        return f"LEAST(GREATEST(CAST({e} AS BIGINT), 0), 2147483647)"

    sa = spread(dim("doc_id"))
    sb = spread(dim("n_chars"))
    return f"""
    SELECT doc_id, (({sa}) | (({sb}) << 1)) AS zkey FROM documents
    """


def q_cdf_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance off the change data feed — the
    pre-image consumer: replay a prefix (snapshot v1), take the rollup
    (COUNT + integer-exact SUM per user-id group), replay the rest (v2),
    then maintain the rollup from changes(v1→v2, include_preimage=True)
    alone — the base table is never re-read. The oracle recomputes the
    final rollup from scratch over the raw events, so any pre-image error
    (missing, duplicated, mis-signed) lands as a value mismatch."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.incremental import (
        incremental_agg_delta,
        merge_agg_delta,
    )
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_iagg_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    grp = (F.col("url").cast("long") % 16).alias("grp")
    # integer-exact measure (the token_frequency_stats discipline): floor of
    # a fixed-point scaling, so sums are associative and engine-independent
    ival = F.coalesce(
        F.floor(F.col("value") * 1000).cast("long"), F.lit(0)
    )

    replay(spark, log.where(F.col("lsn") <= 5000), table, n_slices=1)
    v1 = table.current_version()
    base = (
        table.read(spark, version=v1)
        .select(grp, ival.alias("ival"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("ival").cast("long").alias("vsum"),
        )
    )
    replay(spark, log, table, n_slices=1)
    feed = table.changes(spark, v1, include_preimage=True).select(
        grp, ival.alias("ival"), "_change"
    )
    delta = incremental_agg_delta(feed, ["grp"], "ival")
    return merge_agg_delta(base, delta, ["grp"]).orderBy("grp")


def _sql_cdf_incremental_agg() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    ), fin AS (
      SELECT * FROM latest WHERE rn = 1 AND op <> 'D'
    )
    SELECT CAST(user_id AS BIGINT) % 16 AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(COALESCE(CAST(floor(value * 1000) AS BIGINT), 0))
                AS BIGINT) AS vsum
    FROM fin GROUP BY 1 ORDER BY 1
    """


def q_time_window_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-axis scan of the CDC table: replay the changelog, compact (so
    buckets are single-generation and the manifest's per-file (tmin, tmax)
    lww-major stats can skip whole files), then read the Jan-10..Jan-20
    window via ``read(major_range=...)``. Semantics are post-LWW: a url
    whose FINAL crawl falls outside the window is absent — never served at
    an older in-range version (the MoR-soundness rule in table._read_raw).
    Oracle: the final LWW state filtered by the same closed ts range."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.merge import compact_buckets
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_twin_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    replay(spark, log, table, n_slices=2)
    compact_buckets(spark, table, list(range(8)))
    import datetime as _dt

    # window chosen to split the fixture's final-state ts distribution
    # (finals cluster near the changelog's end — a key's final crawl is its
    # latest): non-vacuous at sf0.01 (32 of 120) and sf0.1 (377)
    lo = _dt.datetime(2024, 1, 29)
    hi = _dt.datetime(2024, 1, 30, 12)
    return table.read(spark, major_range=(lo, hi)).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
    )


def _sql_time_window_scan() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    )
    SELECT user_id, ts, value, props FROM latest
    WHERE rn = 1 AND op <> 'D'
      AND ts BETWEEN TIMESTAMP '2024-01-29' AND TIMESTAMP '2024-01-30 12:00:00'
    """


def q_cdf_follower_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-feed FOLLOWER: a persistent exactly-once CDF consumer.
    The changelog replays in three installments; between installments the
    follower polls the feed and folds the signed delta into a rollup
    persisted in its own state dir (position committed atomically with the
    rollup bytes — the streaming-CDF-source + checkpoint shape). The first
    maintain bootstraps from the base snapshot; the base table is never
    re-read afterwards. Oracle: full recompute of the final rollup from the
    raw events — a lost, doubled, or mis-signed slice anywhere across the
    three maintains lands as a value mismatch."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.follow import ChangeFeedFollower
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_follow_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    follower = ChangeFeedFollower(
        table,
        f"{path}/follower_state",
        group_exprs=[(F.col("url").cast("long") % 16).alias("grp")],
        group_names=["grp"],
        measure=F.coalesce(
            F.floor(F.col("value") * 1000).cast("long"), F.lit(0)
        ),
    )
    replay(spark, log.where(F.col("lsn") <= 3000), table, n_slices=1)
    follower.maintain(spark)  # bootstrap from the v1 snapshot
    replay(spark, log.where(F.col("lsn") <= 6500), table, n_slices=1)
    follower.maintain(spark)  # fold slice (v1, v2]
    replay(spark, log, table, n_slices=1)
    follower.maintain(spark)  # fold slice (v2, v3]
    return follower.rollup(spark).orderBy("grp")


def _sql_cdf_follower_agg() -> str:
    # identical final state to cdf_incremental_agg: the follower's three
    # maintains must land exactly where one full recompute does
    return _sql_cdf_incremental_agg()


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist filtering: per-doc URLs (synthesized from doc_id)
    canonicalized through urlops, host extracted, then a BROADCAST
    left-anti join against the blocklist (every 5th site-K domain) — the
    standard web-corpus domain filter, with the blocklist as a true small
    dimension side. The oracle builds the host directly from doc_id and
    anti-joins the same generated list — an independent derivation of both
    the host and the join."""
    from embulk_input_marketo_spark.functions import urlops

    d = F.col("doc_id")
    raw = F.concat(
        F.lit("HTTPS://WWW.Site-"), (d % 40).cast("string"),
        F.lit(".ExAmple.COM:443/p"),
        F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", raw.alias("url_raw"))
    hosts = docs.withColumn(
        "host", urlops.url_host(urlops.normalize_url(F.col("url_raw")))
    )
    block = spark.range(8).select(
        F.concat(F.lit("site-"), (F.col("id") * 5).cast("string"),
                 F.lit(".example.com")).alias("host")
    )
    return (
        hosts.join(F.broadcast(block), "host", "left_anti")
        .select("doc_id", "host")
    )


def _sql_domain_blocklist() -> str:
    return r"""
    WITH d AS (
      SELECT doc_id,
             'site-' || CAST(doc_id % 40 AS VARCHAR) || '.example.com' AS host
      FROM documents
    )
    SELECT doc_id, host FROM d
    WHERE NOT EXISTS (
      SELECT 1 FROM range(0, 40, 5) r
      WHERE 'site-' || CAST(r.range AS VARCHAR) || '.example.com' = d.host)
    """


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) end-to-end over the embedding column:
    cluster the space, find within-cluster cosine >= 0.95 pairs, resolve
    components, keep the min-id representative per semantic-duplicate
    group. Fixture: embeddings ∪ 5 progressively-perturbed copies of each
    vec_id < 10 vector, so real duplicate groups exist (base pairwise max
    cosine in the table is ~0.51 — organic vectors are all singletons).

    The oracle replays the ENTIRE pipeline, not an equivalent answer:
    centroid selection is the engine-independent md5 draw
    (:func:`functions.similarity.md5_centroids`), assignment rounds scores
    to 6 decimals before the argmax, and components come from an
    independent recursive-CTE transitive closure — so cell assignment,
    pair pruning, and label propagation are all checked exactly."""
    emb = _emb_with_planted(spark, sf_dir)
    # n_cells is SemDeDup's own scale knob (clusters stay small as the
    # corpus grows — the paper runs k=50k on 5B docs); 32 cells over ~2k
    # vectors keeps the within-cell pair expansion bounded AND spreads the
    # pair join across tasks (8 cells over 8 shuffle partitions would put
    # the biggest cell's whole pair loop in one task). max_cell_size is the
    # engine default (1000) and the oracle mirrors it in its cells CTE.
    return similarity.semantic_dedup(emb, n_cells=32, threshold=0.95)


def _emb_with_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic-dedup fixture: embeddings ∪ 5 progressively-perturbed
    copies of each vec_id < 10 vector (organic vectors are all singletons —
    base pairwise max cosine ~0.51). Shared by ``q_semantic_dedup``,
    ``q_semantic_cell_stats`` and the bench's skew-guard record so all three
    describe the same corpus."""
    base = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = (
        base.where(F.col("vec_id") < 10)
        .crossJoin(spark.range(1, 6).select(F.col("id").alias("j")))
        .select(
            (F.lit(100000) + F.col("vec_id") * 10 + F.col("j")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.02) * F.col("j")
            ).alias("embedding"),
        )
    )
    return base.unionByName(planted)


def q_semantic_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew observability for the SemDeDup pair stage
    (:func:`functions.similarity.semantic_cell_stats`): same fixture and
    clustering parameters as ``semantic_dedup``, reporting cells used, the
    largest cell, and what the ``max_cell_size`` guard would exclude — the
    exact twin of the LSH pipeline's ``lsh_bucket_stats``. ``bench.py``
    records this row in the per-round JSON."""
    emb = _emb_with_planted(spark, sf_dir)
    return similarity.semantic_cell_stats(
        emb, n_cells=32, max_cell_size=1000
    )


def _sql_semantic_cell_stats() -> str:
    return r"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), planted AS (
      SELECT 100000 + b.vec_id * 10 + j.j AS vec_id,
             list_transform(b.v, x -> x + 0.02 * j.j) AS v
      FROM base b, range(1, 6) j(j) WHERE b.vec_id < 10
    ), e AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
               AS cell_id,
             v AS centroid
      FROM e
      QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 32
    ), scored AS (
      SELECT e.vec_id, c.cell_id,
             ROUND(list_dot_product(e.v, c.centroid)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6)
               AS s
      FROM e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, cell_id FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cell_id DESC) = 1
    ), sizes AS (
      SELECT cell_id, COUNT(*) AS sz FROM cells GROUP BY cell_id
    )
    SELECT COUNT(*) AS n_cells_used,
           CAST(MAX(sz) AS BIGINT) AS max_cell,
           CAST(COUNT(*) FILTER (WHERE sz > 1000) AS BIGINT)
             AS n_oversize_cells,
           CAST(COALESCE(SUM(sz) FILTER (WHERE sz > 1000), 0) AS BIGINT)
             AS rows_in_oversize
    FROM sizes
    """


def _sql_semantic_dedup() -> str:
    return r"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), planted AS (
      SELECT 100000 + b.vec_id * 10 + j.j AS vec_id,
             list_transform(b.v, x -> x + 0.02 * j.j) AS v
      FROM base b, range(1, 6) j(j) WHERE b.vec_id < 10
    ), e AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
               AS cell_id,
             v AS centroid
      FROM e
      QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= 32
    ), scored AS (
      SELECT e.vec_id, e.v, c.cell_id,
             ROUND(list_dot_product(e.v, c.centroid)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6)
               AS s
      FROM e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, v, cell_id FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cell_id DESC) = 1
    ), guarded AS (
      -- engine's max_cell_size=1000 skew guard: oversize cells are excluded
      -- from pair generation (their members stay singletons below)
      SELECT * FROM cells
      QUALIFY COUNT(*) OVER (PARTITION BY cell_id) <= 1000
    ), pairs AS (
      SELECT a.vec_id AS lu, b.vec_id AS rv
      FROM guarded a JOIN guarded b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.95
    ), edges AS (
      SELECT lu AS u, rv AS v FROM pairs
      UNION
      SELECT rv, lu FROM pairs
    ), reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e2.u, reach.r FROM edges e2 JOIN reach ON e2.v = reach.u
    ), comp AS (SELECT u, MIN(r) AS component_id FROM reach GROUP BY u)
    SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
           CAST(COALESCE(comp.component_id, e.vec_id) AS BIGINT)
             AS component_id,
           e.vec_id = COALESCE(comp.component_id, e.vec_id) AS keep
    FROM e LEFT JOIN comp ON comp.u = e.vec_id
    """


def q_key_exists_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch-frontier membership check: replay the changelog into a
    bloom-enabled lake, then ask "which of these urls exist (live)?" for a
    probe set that is mostly ABSENT — the web-crawl shape. The engine path
    is :meth:`LakeTable.exists_join`: per-bucket key blooms prove absence
    from metadata alone, only buckets still holding candidates are read
    (key column only), and tombstoned urls answer False.

    Probe set (deterministic, from events): every user_id ≡ 0 (mod 3) as a
    present-or-deleted probe, and the NEGATED user_ids ≡ 0 (mod 7) as
    guaranteed-absent probes."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_bloom_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8, bloom_bits=1 << 17,
    )
    replay(spark, log, table, n_slices=2, salt_buckets=8)
    ev = _t(spark, sf_dir, "events")
    probes = (
        ev.where(F.col("user_id") % 3 == 0)
        .select(F.col("user_id").cast("string").alias("probe"))
        .distinct()
        .unionAll(
            ev.where(F.col("user_id") % 7 == 0)
            .select((-F.col("user_id")).cast("string").alias("probe"))
            .distinct()
        )
    )
    return table.exists_join(spark, probes, "probe").select(
        "probe", F.col("exists").alias("is_present")
    )


def _sql_key_exists_probe() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS url, ts
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY url
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    ), live AS (
      SELECT url FROM latest WHERE rn = 1 AND op <> 'D'
    ), probes AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS probe
      FROM events WHERE user_id % 3 = 0
      UNION ALL
      SELECT DISTINCT CAST(-user_id AS VARCHAR)
      FROM events WHERE user_id % 7 = 0
    )
    SELECT p.probe, (l.url IS NOT NULL) AS is_present
    FROM probes p LEFT JOIN live l ON p.probe = l.url
    """


def q_patch_upsert_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level patch merge (partial-image CDC): a changelog whose
    update events carry only SOME columns (null = unchanged) folds to final
    state by per-column LWW with a delete-boundary reset — one map-side
    combined aggregate, shuffle width bounded by the schema
    (operators/patch.py). The patch changelog derives deterministically
    from events: every 37th event is a delete; each payload column is
    independently absent on its own modulus."""
    from embulk_input_marketo_spark.operators.patch import patch_fold

    ev = _t(spark, sf_dir, "events")
    patched = ev.select(
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_id") % 37 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    out = patch_fold(
        patched, key_cols="user_id", order_cols=["ts", "lsn"], op_col="op"
    )
    return out.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("lsn").alias("last_lsn"),
        "event_type",
        "value",
        "props",
    )


def _sql_patch_upsert_fold() -> str:
    # Independent single-pass formulation: per-column candidate structs via
    # NULL-skipping max(CASE...), post-delete clamp applied afterward.
    return """
    WITH patched AS (
      SELECT user_id, ts, event_id AS lsn,
             CASE WHEN event_id % 37 = 0 THEN 'D' ELSE 'U' END AS op,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS event_type,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE props END AS props
      FROM events
    ), agg AS (
      SELECT user_id,
             max(CASE WHEN op = 'D' THEN {'ts': ts, 'lsn': lsn} END) AS last_del,
             max(CASE WHEN op = 'U' THEN {'ts': ts, 'lsn': lsn} END) AS last_up,
             max(CASE WHEN op = 'U' AND event_type IS NOT NULL
                      THEN {'ts': ts, 'lsn': lsn, 'v': event_type} END) AS c_et,
             max(CASE WHEN op = 'U' AND value IS NOT NULL
                      THEN {'ts': ts, 'lsn': lsn, 'v': value} END) AS c_vl,
             max(CASE WHEN op = 'U' AND props IS NOT NULL
                      THEN {'ts': ts, 'lsn': lsn, 'v': props} END) AS c_pr
      FROM patched GROUP BY user_id
    )
    SELECT user_id,
           last_up.ts AS last_ts,
           last_up.lsn AS last_lsn,
           CASE WHEN c_et IS NOT NULL AND (last_del IS NULL OR
                     {'ts': c_et.ts, 'lsn': c_et.lsn} > last_del)
                THEN c_et.v END AS event_type,
           CASE WHEN c_vl IS NOT NULL AND (last_del IS NULL OR
                     {'ts': c_vl.ts, 'lsn': c_vl.lsn} > last_del)
                THEN c_vl.v END AS value,
           CASE WHEN c_pr IS NOT NULL AND (last_del IS NULL OR
                     {'ts': c_pr.ts, 'lsn': c_pr.lsn} > last_del)
                THEN c_pr.v END AS props
    FROM agg
    WHERE last_up IS NOT NULL AND (last_del IS NULL OR last_up > last_del)
    """


def q_cdc_mirror_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven replication (lake/mirror.py): replay the changelog into a
    source lake with the mirror syncing AFTER EVERY commit (bootstrap on
    the first, incremental CDF slices after), then read the REPLICA. The
    replica is maintained change-proportionally — exactly-once via its
    channel watermark — and must equal the source's LWW final state."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.mirror import create_mirror, sync_mirror
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_mirror_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    src = LakeTable.create(
        f"{path}/src", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    holder: dict = {}

    def on_batch(_result) -> None:
        if "dst" not in holder:
            holder["dst"] = create_mirror(src, f"{path}/dst", n_buckets=4)
        sync_mirror(spark, src, holder["dst"])

    replay(spark, log, src, n_slices=2, salt_buckets=8, on_batch=on_batch)
    sync_mirror(spark, src, holder["dst"])  # idempotent catch-up no-op
    return holder["dst"].read(spark).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
    )


def _sql_cdc_mirror_replica() -> str:
    # the replica must equal the source's LWW final state
    return _sql_cdc_final_state()


def q_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE WHERE (lake/merge.delete_where): replay the
    changelog into a lake, then issue a retention delete of every live row
    with value > 60.0 — matching rows become order-key-preserving tombstones
    with scrubbed payloads, only their buckets rewrite. The read-back is
    the final state minus the deleted rows."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.merge import delete_where
    from embulk_input_marketo_spark.replay import replay

    log = _events_as_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(
        prefix="lake_del_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = LakeTable.create(
        f"{path}/web_pages", schema, key_col="url", lww_major="warc_ts",
        n_buckets=8,
    )
    replay(spark, log, table, n_slices=2, salt_buckets=8)
    delete_where(spark, table, F.col("value") > 60.0)
    return table.read(spark).select(
        F.col("url").alias("user_id"),
        F.col("warc_ts").alias("ts"),
        "value",
        "props",
    )


def _sql_retention_delete() -> str:
    return """
    WITH log AS (
      SELECT event_id AS lsn,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error'  THEN 'D'
                  ELSE 'U' END AS op,
             CAST(user_id AS VARCHAR) AS user_id, ts, value, props
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, lsn DESC) AS rn
      FROM log
    )
    SELECT user_id, ts, value, props FROM latest
    WHERE rn = 1 AND op <> 'D' AND (value IS NULL OR value <= 60.0)
    """


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Registry order is the driver's verification order: the driver gates the
# FIRST 50 entries. Round-5 order: the 25 queries that never received a
# driver CORRECTNESS row (appended after position 50 mid-round-3) lead,
# then the three round-5 additions (semantic_cell_stats, image_resize_real,
# audio_stats_real), then the round-4-green veterans (flagship
# cdc_final_state first). With CORRECTNESS_r04's 50 green rows, a green r5
# gate driver-attests every one of the 78 queries across the two rounds.
# Round 6 (optimization) keeps the order FROZEN: oracle text and query
# results are fingerprint-checked against the round start.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sample_k_per_stratum": q_sample_k_per_stratum,
    "assign_split": q_assign_split,
    "contamination_check": q_contamination_check,
    "pack_documents": q_pack_documents,
    "pack_documents_split": q_pack_documents_split,
    "cdc_changes_feed": q_cdc_changes_feed,
    "cdc_changes_preimage": q_cdc_changes_preimage,
    "time_travel_restore": q_time_travel_restore,
    "wal_envelope_roundtrip": q_wal_envelope_roundtrip,
    "wal_schema_drift": q_wal_schema_drift,
    "token_frequency_stats": q_token_frequency_stats,
    "top_words": q_top_words,
    "url_normalize": q_url_normalize,
    "near_dup_components": q_near_dup_components,
    "near_dup_survivors": q_near_dup_survivors,
    "gopher_quality": q_gopher_quality,
    "quality_classifier": q_quality_classifier,
    "corpus_mix": q_corpus_mix,
    "dedup_apply": q_dedup_apply,
    "domain_blocklist": q_domain_blocklist,
    "cdf_incremental_agg": q_cdf_incremental_agg,
    "cdf_follower_agg": q_cdf_follower_agg,
    "time_window_scan": q_time_window_scan,
    "zorder_layout": q_zorder_layout,
    "semantic_dedup": q_semantic_dedup,
    "semantic_cell_stats": q_semantic_cell_stats,
    "image_resize_real": q_image_resize_real,
    "audio_stats_real": q_audio_stats_real,
    "cdc_final_state": q_cdc_final_state,
    "key_exists_probe": q_key_exists_probe,
    "patch_upsert_fold": q_patch_upsert_fold,
    "retention_delete": q_retention_delete,
    "cdc_mirror_replica": q_cdc_mirror_replica,
    "lww_dedup": q_lww_dedup,
    "incremental_window": q_incremental_window,
    "window_slices": q_window_slices,
    "checkpoint_rollup": q_checkpoint_rollup,
    "coerce_props": q_coerce_props,
    "sanitize_ids": q_sanitize_ids,
    "missing_ids": q_missing_ids,
    "fanout_enrichment": q_fanout_enrichment,
    "pricing_rollup": q_pricing_rollup,
    "tumbling_window": q_tumbling_window,
    "token_count": q_token_count,
    "bpe_token_count": q_bpe_token_count,
    "chunk_documents": q_chunk_documents,
    "pii_redact": q_pii_redact,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "extract_text": q_extract_text,
    "doc_stats_bytes": q_doc_stats_bytes,
    "exact_dedup": q_exact_dedup,
    "incremental_dedup": q_incremental_dedup,
    "minhash_dedup_pairs": q_minhash_dedup_pairs,
    "simhash_hamming_pairs": q_simhash_pairs,
    "ngram_jaccard_matrix": q_ngram_jaccard_matrix,
    "embedding_topk": q_embedding_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "invalid_record_filter": q_invalid_record_filter,
    "ann_topk": q_ann_topk,
    "ann_topk_indexed": q_ann_topk_indexed,
    "ivf_topk": q_ivf_topk,
    "kmeans_refine_stats": q_kmeans_refine_stats,
    "training_shards": q_training_shards,
    "corpus_quantiles": q_corpus_quantiles,
    "video_frame_sample": q_video_frame_sample,
    "image_resize": q_image_resize,
    "fingerprint_groups": q_fingerprints,
    "winnow_fingerprint_jaccard": q_winnow_fingerprints,
    "preview_source": q_preview,
    "asof_join": q_asof_join,
    "asof_join_split": q_asof_join_split,
    "sessionize": q_sessionize,
    "sessionize_split": q_sessionize_split,
    "boilerplate_passages": q_boilerplate_passages,
    "remove_repeated_lines": q_remove_repeated_lines,
    "doc_repetition": q_doc_repetition,
    "stratified_sample": q_stratified_sample,
}

ORACLES: dict[str, str] = {
    "key_exists_probe": _sql_key_exists_probe(),
    "patch_upsert_fold": _sql_patch_upsert_fold(),
    "retention_delete": _sql_retention_delete(),
    "cdc_mirror_replica": _sql_cdc_mirror_replica(),
    "cdc_final_state": _sql_cdc_final_state(),
    "lww_dedup": _sql_lww_dedup(),
    "incremental_window": _sql_incremental_window(),
    "window_slices": _sql_window_slices(),
    "checkpoint_rollup": _sql_checkpoint_rollup(),
    "coerce_props": _sql_coerce_props(),
    "sanitize_ids": _sql_sanitize_ids(),
    "missing_ids": _sql_missing_ids(),
    "fanout_enrichment": _sql_fanout_enrichment(),
    "pricing_rollup": _sql_pricing_rollup(),
    "tumbling_window": _sql_tumbling_window(),
    "token_count": _sql_token_count(),
    "bpe_token_count": _sql_bpe_token_count(),
    "chunk_documents": _sql_chunk_documents(),
    "pii_redact": _sql_pii_redact(),
    "quality_score": _sql_quality_score(),
    "lang_id": _sql_lang_id(),
    "extract_text": _sql_extract_text(),
    "doc_stats_bytes": _sql_doc_stats_bytes(),
    "exact_dedup": _sql_exact_dedup(),
    "incremental_dedup": _sql_incremental_dedup(),
    "minhash_dedup_pairs": _sql_minhash_dedup_pairs(),
    "simhash_hamming_pairs": _sql_simhash_pairs(),
    "ngram_jaccard_matrix": _sql_ngram_jaccard_matrix(),
    "embedding_topk": _sql_embedding_topk(),
    "embedding_near_dup": _sql_embedding_near_dup(),
    "invalid_record_filter": _sql_invalid_record_filter(),
    # ANN's oracle is the EXACT brute-force top-k: the multi-table multi-probe
    # candidate pool must cover the true top-k (recall 1.0 on the fixture)
    "ann_topk": _sql_embedding_topk(),
    # the materialized-index path answers the same question; same exact oracle
    "ann_topk_indexed": _sql_embedding_topk(),
    # IVF's oracle is the exact brute-force top-k over the planted-cluster
    # fixture — recall 1.0 while probing only 2 of 8 cells
    "ivf_topk": _sql_ivf_topk(),
    "kmeans_refine_stats": _sql_kmeans_refine_stats(),
    "training_shards": _sql_training_shards(),
    "corpus_quantiles": _sql_corpus_quantiles(),
    "video_frame_sample": _sql_video_frame_sample(),
    "image_resize": _sql_image_resize(),
    "fingerprint_groups": _sql_fingerprints(),
    "winnow_fingerprint_jaccard": _sql_winnow_fingerprints(),
    "preview_source": _sql_preview(),
    "asof_join": _sql_asof_join(),
    # the split variant answers the same question; same independent oracle
    "asof_join_split": _sql_asof_join(),
    "sessionize": _sql_sessionize(),
    # split variant answers the same question; same oracle
    "sessionize_split": _sql_sessionize(),
    "boilerplate_passages": _sql_boilerplate_passages(),
    "remove_repeated_lines": _sql_remove_repeated_lines(),
    "doc_repetition": _sql_doc_repetition(),
    "stratified_sample": _sql_stratified_sample(),
    "sample_k_per_stratum": _sql_sample_k_per_stratum(),
    "assign_split": _sql_assign_split(),
    "contamination_check": _sql_contamination_check(),
    "pack_documents": _sql_pack_documents(),
    # the split variant answers the same question; same independent oracle
    "pack_documents_split": _sql_pack_documents(),
    "cdc_changes_feed": _sql_cdc_changes_feed(),
    "cdc_changes_preimage": _sql_cdc_changes_preimage(),
    "time_travel_restore": _sql_time_travel_restore(),
    "wal_envelope_roundtrip": _sql_wal_envelope_roundtrip(),
    "wal_schema_drift": _sql_wal_schema_drift(),
    "token_frequency_stats": _sql_token_frequency_stats(),
    "top_words": _sql_top_words(),
    "url_normalize": _sql_url_normalize(),
    "near_dup_components": _sql_near_dup_components(),
    "near_dup_survivors": _sql_near_dup_survivors(),
    "gopher_quality": _sql_gopher_quality(),
    "quality_classifier": _sql_quality_classifier(),
    "corpus_mix": _sql_corpus_mix(),
    "dedup_apply": _sql_dedup_apply(),
    "domain_blocklist": _sql_domain_blocklist(),
    "cdf_incremental_agg": _sql_cdf_incremental_agg(),
    "cdf_follower_agg": _sql_cdf_follower_agg(),
    "time_window_scan": _sql_time_window_scan(),
    "zorder_layout": _sql_zorder_layout(),
    "semantic_dedup": _sql_semantic_dedup(),
    "semantic_cell_stats": _sql_semantic_cell_stats(),
    "image_resize_real": _sql_image_resize_real(),
    "audio_stats_real": _sql_audio_stats_real(),
}
