"""MERGE INTO for the lake table — key-partitioned copy-on-write upsert with
manifest-gated exactly-once and order-aware (LWW) conflict resolution.

Semantics (the engine's core operator, SURVEY.md §2.4):

    MERGE INTO base t USING batch s ON t.<key> = s.<key>
    WHEN MATCHED AND (s.warc_ts, s.lsn) > (t._ts, t._lsn) AND s.op =  'D' THEN DELETE*
    WHEN MATCHED AND (s.warc_ts, s.lsn) > (t._ts, t._lsn)               THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *
    (*deletes become tombstones that keep their order key)

The order condition matters: batches arrive in lsn-slice order but business
time ``warc_ts`` is the LWW major key, so a later slice can carry an *older*
version of a key — it must lose against the already-applied row. Likewise a
late update must not resurrect a newer delete, hence tombstones.

Physical strategy, chosen for 10^10-event scale:

1. batch keys hash into a set of touched buckets → ONLY those buckets' files
   are read and rewritten (copy-on-write bounded by batch key spread, not
   table size).
2. new bucket contents = salted-LWW-reduce( old_bucket_rows ∪ batch_rows ) —
   a single hash aggregate with map-side partial aggregation instead of a
   join; associative/commutative because (warc_ts, _lsn) totally orders rows
   per key. Hot keys are pre-split by the salt phase; AQE coalesces the rest.
3. results written partitioned-by-bucket into a fresh snapshot directory;
   the commit (new files + batch_id + checkpoint advance) is one atomic
   manifest swap.

Idempotence: ``batch_id`` already in the manifest → no-op. This is the
exactly-once the reference lacks (it re-downloads and re-emits on retry,
``MarketoServiceImpl.java:113-133``; "Resume supported: no", README.md:25).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_input_marketo_spark.lake.table import LakeTable, Manifest, bucket_expr
from embulk_input_marketo_spark.operators.dedup import lww_dedup


@dataclass
class MergeResult:
    applied: bool
    version: int
    rows_in: int
    rows_upserted: int
    rows_deleted: int
    touched_buckets: int


def merge_batch(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    batch_id: str,
    op_col: str = "op",
    lsn_col: str = "_lsn",
    salt_buckets: int | None = 16,
    checkpoint: dict[str, Any] | None = None,
    lineage: dict[str, Any] | None = None,
) -> MergeResult:
    """Apply a LWW-deduped CDC batch (one row per key) to the table.

    ``batch`` must carry the table's current user-schema columns plus
    ``op_col`` ('I'/'U'/'D') and ``lsn_col`` (unique monotone order minor).
    ``checkpoint`` (e.g. {'hwm_lsn': ...}) commits atomically with the data.
    """
    m = table.manifest()
    if batch_id in m.applied_batches:
        return MergeResult(False, m.version, 0, 0, 0, 0)

    key = m.key_col
    data_cols = [f.name for f in m.current_schema().fields]
    full_cols = data_cols + ["_lsn", "_deleted"]

    batch_full = batch.select(
        *data_cols,
        F.col(lsn_col).cast("long").alias("_lsn"),
        (F.col(op_col) == "D").alias("_deleted"),
    ).withColumn("_b", bucket_expr(key, m.n_buckets))
    batch_full.persist()
    try:
        # touched buckets + batch metrics in ONE action (tiny result set)
        stats = (
            batch_full.groupBy("_b")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_if(F.col("_deleted")).alias("d"),
            )
            .collect()
        )
        touched = sorted(r["_b"] for r in stats)
        rows_in = int(sum(r["n"] for r in stats))
        rows_deleted = int(sum(r["d"] for r in stats))
        rows_upserted = rows_in - rows_deleted
        if rows_in == 0:
            return MergeResult(False, m.version, 0, 0, 0, 0)

        old = table.read(spark, buckets=touched, include_internal=True).withColumn(
            "_b", bucket_expr(key, m.n_buckets)
        )
        merged = lww_dedup(
            old.select(*full_cols, "_b").unionByName(
                batch_full.select(*full_cols, "_b")
            ),
            key_cols=key,
            order_cols=[m.lww_major, "_lsn"],
            salt_buckets=salt_buckets,
        )

        new_version = m.version + 1
        staging = table.snapshot_staging_dir(new_version)
        (
            merged.repartition(max(len(touched), 1), F.col("_b"))
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(staging)
        )

        new_files = _enumerate_bucket_files(staging, m.schema_version)
        files = dict(m.files)
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])

        nm = Manifest(
            version=new_version,
            parent=m.version,
            key_col=m.key_col,
            lww_major=m.lww_major,
            n_buckets=m.n_buckets,
            schema_version=m.schema_version,
            schemas=m.schemas,
            renames=m.renames,
            files=files,
            applied_batches=m.applied_batches + [batch_id],
            checkpoint={**m.checkpoint, **(checkpoint or {})},
            summary={
                "operation": "merge",
                "batch_id": batch_id,
                "rows_in": rows_in,
                "rows_upserted": rows_upserted,
                "rows_deleted": rows_deleted,
                "touched_buckets": len(touched),
                "lineage": lineage or {},
            },
            committed_at=time.time(),
        )
        table._write_manifest(nm)
        return MergeResult(
            True, new_version, rows_in, rows_upserted, rows_deleted, len(touched)
        )
    finally:
        batch_full.unpersist()


def vacuum_tombstones(
    spark: SparkSession,
    table: LakeTable,
    watermark_major: Any,
) -> int:
    """Physically drop tombstones whose LWW-major key (warc_ts) is older than
    ``watermark_major``: no future event can carry a smaller order key than
    the lateness watermark, so those deletes can never lose a conflict again.
    Rewrites every bucket (run occasionally, like Iceberg compaction)."""
    m = table.manifest()
    data_cols = [f.name for f in m.current_schema().fields]
    full = table.read(spark, include_internal=True).withColumn(
        "_b", bucket_expr(m.key_col, m.n_buckets)
    )
    keep = full.where(
        (~F.col("_deleted")) | (F.col(m.lww_major) >= F.lit(watermark_major))
    )
    new_version = m.version + 1
    staging = table.snapshot_staging_dir(new_version)
    (
        keep.select(*data_cols, "_lsn", "_deleted", "_b")
        .repartition(m.n_buckets, F.col("_b"))
        .write.mode("overwrite")
        .partitionBy("_b")
        .parquet(staging)
    )
    files = _enumerate_bucket_files(staging, m.schema_version)
    nm = Manifest(
        version=new_version,
        parent=m.version,
        key_col=m.key_col,
        lww_major=m.lww_major,
        n_buckets=m.n_buckets,
        schema_version=m.schema_version,
        schemas=m.schemas,
        renames=m.renames,
        files=files,
        applied_batches=m.applied_batches,
        checkpoint=m.checkpoint,
        summary={"operation": "vacuum_tombstones", "watermark": str(watermark_major)},
        committed_at=time.time(),
    )
    table._write_manifest(nm)
    return new_version


def _enumerate_bucket_files(staging: str, sv: int) -> dict[str, list[dict]]:
    """List written parquet files per bucket. Local FS here; on a cluster the
    same walk goes through the Hadoop FileSystem API."""
    out: dict[str, list[dict]] = {}
    if not os.path.isdir(staging):
        return out
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("_b="):
            continue
        b = str(int(entry.split("=", 1)[1]))
        bdir = os.path.join(staging, entry)
        paths = [
            os.path.join(bdir, f)
            for f in sorted(os.listdir(bdir))
            if f.endswith(".parquet")
        ]
        if paths:
            out[b] = [{"path": p, "sv": sv} for p in paths]
    return out
