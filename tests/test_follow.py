"""Change-feed follower: exactly-once incremental rollup maintenance.

Covers the contract the cdf_follower_agg oracle can't see:
- crash between the rollup write and the position swap re-consumes the
  SAME slice and lands on the same state (idempotent commit);
- a restarted follower (fresh object, same state dir) resumes where the
  old one stopped;
- a caught-up maintain is a no-op (no rewrite, position unchanged);
- poll() exposes exactly the pending slice and None when caught up.
"""

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.lake.follow import ChangeFeedFollower
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


def _follower(table, state):
    return ChangeFeedFollower(
        table,
        state,
        group_exprs=[(F.col("url").cast("long") % 2).alias("grp")],
        group_names=["grp"],
        measure=F.floor(F.col("value")).cast("long"),
    )


def _rollup(follower, spark):
    return {
        (r.grp, r.n_rows, r.vsum)
        for r in follower.rollup(spark).collect()
    }


def _recompute(table, spark):
    return {
        (r.grp, r.n_rows, r.vsum)
        for r in table.read(spark)
        .groupBy((F.col("url").cast("long") % 2).alias("grp"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.floor(F.col("value")).cast("long"))
            .cast("long").alias("vsum"),
        )
        .collect()
    }


def _make(tmp_path, spark):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=4,
    )
    merge_batch(
        spark, table,
        _batch(spark, [("1", 1, 10, "I", 1), ("2", 1, 20, "I", 2),
                       ("3", 1, 30, "I", 3)]),
        batch_id="b1", lsn_col="lsn",
    )
    return table


def test_bootstrap_then_incremental_matches_recompute(spark, tmp_path):
    table = _make(tmp_path, spark)
    f = _follower(table, str(tmp_path / "state"))
    assert f.poll(spark) is None  # pre-bootstrap: nothing to stream
    f.maintain(spark)
    assert _rollup(f, spark) == _recompute(table, spark)

    merge_batch(
        spark, table,
        _batch(spark, [("1", 2, 11, "U", 4), ("2", 2, 0, "D", 5),
                       ("4", 2, 40, "I", 6)]),
        batch_id="b2", lsn_col="lsn",
    )
    pending = f.poll(spark)
    assert pending is not None and pending.count() > 0
    f.maintain(spark)
    assert f.poll(spark) is None
    assert _rollup(f, spark) == _recompute(table, spark)


def test_caught_up_maintain_is_noop(spark, tmp_path):
    table = _make(tmp_path, spark)
    f = _follower(table, str(tmp_path / "state"))
    pos = f.maintain(spark)
    gen_before = sorted(os.listdir(str(tmp_path / "state")))
    assert f.maintain(spark) == pos
    assert sorted(os.listdir(str(tmp_path / "state"))) == gen_before


def test_crash_before_position_swap_is_exactly_once(spark, tmp_path):
    table = _make(tmp_path, spark)
    state = str(tmp_path / "state")
    f = _follower(table, state)
    f.maintain(spark)
    merge_batch(
        spark, table,
        _batch(spark, [("1", 2, 11, "U", 4)]),
        batch_id="b2", lsn_col="lsn",
    )

    # simulate a crash AFTER the rollup parquet lands but BEFORE the _pos
    # swap: run the fold by hand the way maintain() does, writing the
    # generation dir, then "die" (never swap _pos)
    crashed = ChangeFeedFollower(
        table, state, f.group_exprs, f.group_names, f.measure
    )
    feed = table.changes(
        spark, crashed.position(), table.current_version(),
        include_preimage=True,
    ).select(*crashed.group_exprs, crashed.measure.alias("_m"), "_change")
    from embulk_input_marketo_spark.lake.incremental import (
        incremental_agg_delta,
        merge_agg_delta,
    )
    merged = merge_agg_delta(
        crashed.rollup(spark),
        incremental_agg_delta(feed, ["grp"], "_m"),
        ["grp"],
    )
    orphan = os.path.join(state, "rollup-v999999999999-deadbeef")
    merged.write.parquet(orphan)
    # position unmoved: the slice is still pending in full
    assert crashed.position() < table.current_version()

    # recovery: a fresh follower re-consumes the SAME slice exactly once
    recovered = _follower(table, state)
    recovered.maintain(spark)
    assert _rollup(recovered, spark) == _recompute(table, spark)
    assert not os.path.exists(orphan)  # crash leftover reaped


def test_restart_resumes_from_disk(spark, tmp_path):
    table = _make(tmp_path, spark)
    state = str(tmp_path / "state")
    _follower(table, state).maintain(spark)
    merge_batch(
        spark, table,
        _batch(spark, [("9", 2, 90, "I", 4)]),
        batch_id="b2", lsn_col="lsn",
    )
    f2 = _follower(table, state)  # brand-new object, same checkpoint dir
    assert f2.position() == 1
    f2.maintain(spark)
    assert _rollup(f2, spark) == _recompute(table, spark)
