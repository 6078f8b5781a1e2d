"""Multi-writer optimistic concurrency on the lake commit protocol.

The manifest hard-link is the commit point (POSIX create-if-absent = the
CAS); the `_current` pointer is a monotone hint that `current_version()`
rolls forward over. Staging dirs and bucket side files are unique per
attempt, so a losing writer can never clobber a winner's committed bytes.

Reference parity note: the reference serializes everything through one
Embulk transaction (MarketoInputPluginDelegate.java) — multi-writer
commits are beyond-reference, Iceberg/Delta-parity surface.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake.merge import merge_batch
from embulk_input_marketo_spark.lake.table import (
    CommitConflictError,
    LakeTable,
    Manifest,
    retry_commit,
)


def _mk(tmp_path, name="t"):
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ])
    return LakeTable.create(str(tmp_path / name), schema, key_col="url",
                            lww_major="warc_ts", n_buckets=4)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, f"2024-01-01 00:00:0{i}", i, "I", i + 1)
         for i, u in enumerate(rows)],
        ["url", "warc_ts", "v", "op", "_lsn"],
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _stale_manifest(m, summary):
    """A second writer's manifest prepared from the same base as `m`'s
    parent — i.e. racing for the same version."""
    return Manifest(
        version=m.version, parent=m.parent, key_col=m.key_col,
        lww_major=m.lww_major, n_buckets=m.n_buckets,
        schema_version=m.schema_version, schemas=m.schemas,
        renames=m.renames, files=m.files,
        applied_batches=m.applied_batches, checkpoint=m.checkpoint,
        summary=summary, committed_at=m.committed_at,
    )


def test_second_writer_same_version_conflicts_winner_untouched(
    spark, tmp_path
):
    table = _mk(tmp_path)
    assert merge_batch(spark, table, _batch(spark, ["a", "b"]),
                       batch_id="w1").applied
    winner = table.manifest(1)
    loser = _stale_manifest(winner, {"operation": "racer"})
    with pytest.raises(CommitConflictError):
        table._write_manifest(loser)
    # the committed manifest is byte-for-byte the winner's
    assert table.manifest(1).summary["operation"] == "merge"
    assert {r["url"] for r in table.read(spark).collect()} == {"a", "b"}


def test_conflict_reclaims_losers_staging(spark, tmp_path):
    table = _mk(tmp_path)
    merge_batch(spark, table, _batch(spark, ["a"]), batch_id="w1")
    staging = table.snapshot_staging_dir(1)
    os.makedirs(staging)
    with open(os.path.join(staging, "part-0.parquet"), "w") as f:
        f.write("x")
    loser = _stale_manifest(table.manifest(1), {"operation": "racer"})
    with pytest.raises(CommitConflictError):
        table.commit(loser, staging)
    assert not os.path.exists(staging)


def test_pointer_is_a_hint_commit_is_the_link(spark, tmp_path):
    table = _mk(tmp_path)
    merge_batch(spark, table, _batch(spark, ["a"]), batch_id="w1")
    # simulate a writer that died between manifest link and pointer swap
    with open(os.path.join(table.meta_dir, "_current"), "w") as f:
        f.write("0")
    assert table.current_version() == 1  # rolled forward over the link
    r = merge_batch(spark, table, _batch(spark, ["b"]), batch_id="w2")
    assert r.applied and r.version == 2
    assert {x["url"] for x in table.read(spark).collect()} == {"a", "b"}


def test_pointer_never_regresses(spark, tmp_path):
    table = _mk(tmp_path)
    merge_batch(spark, table, _batch(spark, ["a"]), batch_id="w1")
    merge_batch(spark, table, _batch(spark, ["b"]), batch_id="w2")
    # a stalled v1 writer waking up and re-advertising must not move the
    # hint backward past v2
    table._advance_pointer(1)
    with open(os.path.join(table.meta_dir, "_current")) as f:
        assert int(f.read()) == 2


def test_interleaved_writers_conflict_then_rebase(spark, tmp_path):
    """Writer B prepares its commit from base v0; writer A lands v1 while
    B is mid-commit. B's CAS must lose, reclaim its staging, and succeed
    on retry against the new base — with BOTH batches' rows in the final
    state and no file of A's shredded by B's losing attempt."""
    table = _mk(tmp_path)
    orig_commit = table.commit
    fired = {"hit": False}

    def hostile_commit(nm, staging=None):
        if not fired["hit"]:
            fired["hit"] = True
            table.commit = orig_commit
            assert merge_batch(  # A sneaks in and wins version 1
                spark, table, _batch(spark, ["a1", "a2"]), batch_id="A"
            ).applied
        return orig_commit(nm, staging)

    table.commit = hostile_commit
    r = retry_commit(
        lambda: merge_batch(
            spark, table, _batch(spark, ["b1", "b2"]), batch_id="B"
        )
    )
    assert fired["hit"] and r.applied and r.version == 2
    assert {x["url"] for x in table.read(spark).collect()} == {
        "a1", "a2", "b1", "b2",
    }
    # the losing attempt's staging dir was reclaimed: every surviving
    # snap-1 attempt dir is referenced by the committed v1 manifest
    v1_paths = {
        os.path.dirname(os.path.dirname(e["path"]))
        for b in set(table.manifest(1).files)
        for e in table.manifest(1).files[b]
    }
    on_disk = set(glob.glob(os.path.join(table.data_dir, "snap-000000000001*")))
    assert on_disk <= {os.path.abspath(p) for p in v1_paths} | v1_paths


def test_retry_commit_exhausts_and_reraises():
    calls = {"n": 0}

    def always_conflicts():
        calls["n"] += 1
        raise CommitConflictError("nope")

    with pytest.raises(CommitConflictError):
        retry_commit(always_conflicts, attempts=3)
    assert calls["n"] == 3


class TestWriteAuditPublish:
    """WAP: stage a merge durably but invisibly, audit the would-be table
    state, then CAS fast-forward (or discard). The corpus-quality gate
    pattern: no consumer sees a batch until its checks pass."""

    def test_staged_invisible_until_published(self, spark, tmp_path):
        table = _mk(tmp_path)
        r = merge_batch(spark, table, _batch(spark, ["a", "b"]),
                        batch_id="s1", publish=False)
        assert r.applied and r.staged and r.version == 1
        assert table.current_version() == 0
        assert table.read(spark).count() == 0
        assert table.list_staged() == ["s1"]
        # the audit read sees the candidate state
        assert {x["url"] for x in table.read_staged(spark, "s1").collect()} \
            == {"a", "b"}
        m = table.publish_staged("s1")
        assert m.version == 1 and table.current_version() == 1
        assert table.list_staged() == []
        assert {x["url"] for x in table.read(spark).collect()} == {"a", "b"}
        # published commit carries the batch id: re-applying is a no-op
        assert not merge_batch(spark, table, _batch(spark, ["a"]),
                               batch_id="s1").applied

    def test_publish_conflicts_when_base_moved(self, spark, tmp_path):
        from embulk_input_marketo_spark.lake.table import (
            PublishConflictError,
        )

        table = _mk(tmp_path)
        merge_batch(spark, table, _batch(spark, ["b1"]),
                    batch_id="B", publish=False)
        merge_batch(spark, table, _batch(spark, ["a1"]), batch_id="A")
        with pytest.raises(PublishConflictError):
            table.publish_staged("B")
        # re-stage against the new base, then publish cleanly
        merge_batch(spark, table, _batch(spark, ["b1"]),
                    batch_id="B", publish=False)
        table.publish_staged("B")
        assert {x["url"] for x in table.read(spark).collect()} == {"a1", "b1"}

    def test_discard_reclaims_own_files_only(self, spark, tmp_path):
        table = _mk(tmp_path)
        merge_batch(spark, table, _batch(spark, ["keep"]), batch_id="base")
        merge_batch(spark, table, _batch(spark, ["bad row"]),
                    batch_id="audit_fail", publish=False)
        # the audit: a quality gate rejects the candidate
        bad = table.read_staged(spark, "audit_fail").where(
            F.col("url").contains(" ")
        )
        assert bad.count() == 1
        staged = table.staged_manifest("audit_fail")
        own = {
            os.path.dirname(os.path.dirname(e["path"]))
            for b in set(staged.files) for e in staged.files[b]
            if int(e["v"]) == staged.version
        }
        table.discard_staged("audit_fail")
        assert table.list_staged() == []
        assert all(not os.path.exists(d) for d in own)
        # committed data untouched
        assert {x["url"] for x in table.read(spark).collect()} == {"keep"}

    def test_expiry_never_reclaims_staged_files(self, spark, tmp_path):
        table = _mk(tmp_path)
        merge_batch(spark, table, _batch(spark, ["s"]),
                    batch_id="st", publish=False)
        for i in range(4):
            merge_batch(spark, table, _batch(spark, [f"c{i}"]),
                        batch_id=f"c{i}")
        table.expire_snapshots(keep_last=1)
        assert {x["url"] for x in table.read_staged(spark, "st").collect()} \
            == {"s"}
