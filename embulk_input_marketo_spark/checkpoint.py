"""Checkpoint / state-table view over lake manifests.

The reference advances its high-water mark by emitting a ``ConfigDiff`` only
on successful completion (``MarketoBaseBulkExtractInputPlugin.buildConfigDiff:
126-137``) — state lives *outside* the data, so a crash between emit-data and
emit-state double-applies. Here the checkpoint is a field of the same manifest
the merge commits, so data+state advance atomically; this module is just the
read/reporting surface (FIXTURES.md A3 shape).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake.table import LakeTable

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField("batch_id", T.StringType()),
        T.StructField("hwm_lsn", T.LongType()),
        T.StructField("hwm_warc_ts", T.StringType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_upserted", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("touched_buckets", T.LongType()),
        T.StructField("lineage", T.StringType()),
        T.StructField("committed_at", T.DoubleType()),
    ]
)


def batch_id_for(table_path: str, lo: int, hi: int) -> str:
    """Deterministic idempotence key for the window (lo, hi] on a table."""
    return hashlib.sha256(f"{table_path}|{lo}|{hi}".encode()).hexdigest()[:24]


def resume_hwm(table: LakeTable) -> int:
    """Where to resume: the committed high-water mark (exactly-once resume —
    the capability the reference documents as absent, README.md:25)."""
    return int(table.checkpoint().get("hwm_lsn", -1))


def checkpoints_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Materialize the state table from manifest history (A3 analogue)."""
    import json

    rows = []
    for m in table.history():
        if m.summary.get("operation") != "merge":
            continue
        rows.append(
            (
                m.version,
                m.summary.get("batch_id"),
                int(m.checkpoint.get("hwm_lsn", -1)),
                str(m.checkpoint.get("hwm_warc_ts")),
                int(m.summary.get("rows_in", 0)),
                int(m.summary.get("rows_upserted", 0)),
                int(m.summary.get("rows_deleted", 0)),
                int(m.summary.get("touched_buckets", 0)),
                json.dumps(m.summary.get("lineage", {})),
                float(m.committed_at),
            )
        )
    return spark.createDataFrame(rows, CHECKPOINT_SCHEMA)
