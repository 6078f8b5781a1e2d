"""RESTORE (rollback-to-snapshot): metadata-only commit that re-points the
table at an earlier snapshot.

Contract under test:
- the restored read equals the target snapshot's read, byte-for-byte;
- the replay checkpoint (hwm) and applied-batch ledger roll back WITH the
  data, so resuming ingest re-applies exactly the rolled-back suffix and
  converges to the pre-restore state (exactly-once composes with rollback);
- restore writes NO data files (pointer re-targeting only);
- rolled-back versions stay time-travelable until expiry, and expiry after
  a restore keeps the restored snapshot's data live even when the versions
  between target and restore are expired.
"""

import datetime
import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.lake.merge import merge_batch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                url=u,
                warc_ts=datetime.datetime(2024, 1, 1)
                + datetime.timedelta(seconds=ts),
                value=float(v),
                op=op,
                lsn=lsn,
            )
            for (u, ts, v, op, lsn) in rows
        ]
    )


def _state(table, spark):
    return {
        (r.url, r.warc_ts, r.value)
        for r in table.read(spark).collect()
    }


def _data_files(table):
    return set(
        glob.glob(os.path.join(table.data_dir, "**", "*.parquet"),
                  recursive=True)
    )


def _make(tmp_path, spark):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=4,
    )
    merge_batch(
        spark, table,
        _batch(spark, [("a", 1, 10, "I", 1), ("b", 2, 20, "I", 2)]),
        batch_id="b1", lsn_col="lsn",
        checkpoint={"hwm_lsn": 2}, window=(-1, 2),
    )
    v1 = table.current_version()
    merge_batch(
        spark, table,
        _batch(spark, [("a", 3, 11, "U", 3), ("b", 4, 0, "D", 4),
                       ("c", 5, 30, "I", 5)]),
        batch_id="b2", lsn_col="lsn",
        checkpoint={"hwm_lsn": 5}, window=(2, 5),
    )
    v2 = table.current_version()
    return table, v1, v2


def test_restore_reverts_state_and_checkpoint(spark, tmp_path):
    table, v1, v2 = _make(tmp_path, spark)
    before = _state(table, spark)
    want = {r for r in before}  # v2 state, for the time-travel check below
    target_state = {
        (r.url, r.warc_ts, r.value)
        for r in table.read(spark, version=v1).collect()
    }

    m = table.restore(v1)
    assert m.version == v2 + 1 and m.parent == v2
    assert m.summary == {"operation": "restore", "restored_from": v1}
    assert _state(table, spark) == target_state
    # full table state rolls back: checkpoint + idempotence ledger
    assert table.manifest().checkpoint["hwm_lsn"] == 2
    assert "b2" not in table.applied_batch_ids()
    # rolled-back history stays time-travelable until expiry
    assert {
        (r.url, r.warc_ts, r.value)
        for r in table.read(spark, version=v2).collect()
    } == want


def test_restore_is_metadata_only_and_resume_converges(spark, tmp_path):
    table, v1, v2 = _make(tmp_path, spark)
    v2_state = _state(table, spark)
    files_before = _data_files(table)
    table.restore(v1)
    assert _data_files(table) == files_before  # no data moved or written

    # resuming ingest from the rolled-back checkpoint re-applies the suffix
    # (same batch id — the restored ledger forgot it) and converges
    merge_batch(
        spark, table,
        _batch(spark, [("a", 3, 11, "U", 3), ("b", 4, 0, "D", 4),
                       ("c", 5, 30, "I", 5)]),
        batch_id="b2", lsn_col="lsn",
        checkpoint={"hwm_lsn": 5}, window=(2, 5),
    )
    assert _state(table, spark) == v2_state
    assert table.manifest().checkpoint["hwm_lsn"] == 5


def test_restore_to_frontier_is_noop(spark, tmp_path):
    table, v1, v2 = _make(tmp_path, spark)
    m = table.restore(v2)
    assert m.version == v2  # no empty commit
    assert table.current_version() == v2


def test_expire_after_restore_keeps_restored_data_live(spark, tmp_path):
    table, v1, v2 = _make(tmp_path, spark)
    target_state = {
        (r.url, r.warc_ts, r.value)
        for r in table.read(spark, version=v1).collect()
    }
    table.restore(v1)
    # expire everything but the restore commit itself: v1's manifest goes,
    # but the restore manifest's pointers keep v1's side files + data alive
    table.expire_snapshots(keep_last=1)
    assert _state(table, spark) == target_state
    # and a fresh reader (no cached state) agrees
    assert {
        (r.url, r.warc_ts, r.value)
        for r in LakeTable(table.path).read(spark).collect()
    } == target_state


def test_cdf_across_restore_retracts_the_suffix(spark, tmp_path):
    table, v1, v2 = _make(tmp_path, spark)
    v3 = table.restore(v1).version
    ch = {
        (r.url, r["_change"])
        for r in table.changes(spark, v2, v3).collect()
    }
    # the restore retracts the suffix: a's update reverts (update), b's
    # delete reverts (insert of the old row), c's insert reverts (delete)
    assert ch == {("a", "update"), ("b", "insert"), ("c", "delete")}
