"""CDF-driven table mirroring (lake/mirror.py) — exactly-once replication.

Contract under test:
- bootstrap + incremental syncs converge the replica to the source state
  after every source commit (inserts, updates, deletes);
- the read position is the replica's channel watermark: re-running a sync
  (crash-redelivery) applies nothing twice and commits no new version;
- added source columns propagate (metadata-only add on the replica, old
  rows read NULL); replica-only columns raise instead of silently diverging;
- a replica with a different bucket count still converges (re-bucketed);
- lag/position accessors track the source version chain.
"""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.lake.merge import merge_batch
from embulk_input_marketo_spark.lake.mirror import (
    create_mirror,
    mirror_lag,
    mirror_position,
    sync_mirror,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, warc_ts=_ts(ts), value=float(v), op=op, lsn=lsn)
         for (u, ts, v, op, lsn) in rows]
    )


def _state(spark, table):
    return {
        (r.url, r.warc_ts, r.value) for r in table.read(spark).collect()
    }


def _src(tmp_path, spark):
    src = LakeTable.create(
        str(tmp_path / "src"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=4,
    )
    merge_batch(
        spark, src,
        _batch(spark, [("a", 1, 10, "I", 1), ("b", 2, 20, "I", 2)]),
        batch_id="b1", lsn_col="lsn",
    )
    return src


class TestMirror:
    def test_bootstrap_then_incremental_converges(self, spark, tmp_path):
        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        rep = sync_mirror(spark, src, dst)
        assert rep.bootstrapped and rep.applied
        assert _state(spark, dst) == _state(spark, src)

        merge_batch(
            spark, src,
            _batch(spark, [("a", 3, 11, "U", 3), ("b", 4, 0, "D", 4),
                           ("c", 5, 30, "I", 5)]),
            batch_id="b2", lsn_col="lsn",
        )
        rep2 = sync_mirror(spark, src, dst)
        assert rep2.applied and not rep2.bootstrapped
        assert _state(spark, dst) == _state(spark, src)
        assert {r.url for r in dst.read(spark).collect()} == {"a", "c"}

    def test_sync_after_every_commit_matches(self, spark, tmp_path):
        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        commits = [
            [("a", 6, 12, "U", 6)],
            [("a", 7, 0, "D", 7), ("d", 7, 40, "I", 8)],
            [("a", 9, 13, "I", 9)],
        ]
        sync_mirror(spark, src, dst)
        for i, rows in enumerate(commits):
            merge_batch(spark, src, _batch(spark, rows),
                        batch_id=f"c{i}", lsn_col="lsn")
            sync_mirror(spark, src, dst)
            assert _state(spark, dst) == _state(spark, src), f"commit {i}"

    def test_redelivery_is_noop(self, spark, tmp_path):
        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        sync_mirror(spark, src, dst)
        v = dst.current_version()
        rep = sync_mirror(spark, src, dst)
        assert not rep.applied
        assert dst.current_version() == v
        assert mirror_lag(src, dst) == 0

    def test_position_and_lag(self, spark, tmp_path):
        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        assert mirror_position(dst) == -1
        assert mirror_lag(src, dst) == src.current_version() + 1
        sync_mirror(spark, src, dst)
        assert mirror_position(dst) == src.current_version()
        merge_batch(spark, src, _batch(spark, [("z", 9, 1, "I", 9)]),
                    batch_id="bz", lsn_col="lsn")
        assert mirror_lag(src, dst) >= 1
        sync_mirror(spark, src, dst)
        assert mirror_lag(src, dst) == 0

    def test_schema_add_propagates(self, spark, tmp_path):
        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        sync_mirror(spark, src, dst)
        src.evolve_schema([{"change": "add", "name": "lang",
                            "type": "string"}])
        b = _batch(spark, [("c", 5, 30, "I", 5)]).withColumn(
            "lang", F.lit("en")
        )
        merge_batch(spark, src, b, batch_id="b2", lsn_col="lsn")
        rep = sync_mirror(spark, src, dst)
        assert rep.schema_added == ["lang"]
        rows = {r.url: r.lang for r in dst.read(spark).collect()}
        assert rows["c"] == "en"
        # pre-evolution replica rows read NULL, like the source's own history
        assert rows["a"] is None

    def test_replica_extra_column_raises(self, spark, tmp_path):
        import pytest

        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        sync_mirror(spark, src, dst)
        dst.evolve_schema([{"change": "add", "name": "extra",
                            "type": "string"}])
        merge_batch(spark, src, _batch(spark, [("z", 9, 1, "I", 9)]),
                    batch_id="bz", lsn_col="lsn")
        with pytest.raises(ValueError, match="renames/drops do not"):
            sync_mirror(spark, src, dst)

    def test_replica_type_divergence_raises(self, spark, tmp_path):
        """A same-name column whose TYPE diverges between source and
        replica must raise, not be papered over by the merge's cast."""
        import pytest

        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"))
        sync_mirror(spark, src, dst)
        src.evolve_schema([{"change": "add", "name": "score",
                            "type": "long"}])
        dst.evolve_schema([{"change": "add", "name": "score",
                            "type": "string"}])
        b = _batch(spark, [("z", 9, 1, "I", 9)]).withColumn(
            "score", F.lit(7).cast("long")
        )
        merge_batch(spark, src, b, batch_id="bz", lsn_col="lsn")
        with pytest.raises(ValueError, match="column types diverge"):
            sync_mirror(spark, src, dst)

    def test_rebucketed_replica_converges(self, spark, tmp_path):
        src = _src(tmp_path, spark)
        dst = create_mirror(src, str(tmp_path / "dst"), n_buckets=2)
        sync_mirror(spark, src, dst)
        merge_batch(spark, src,
                    _batch(spark, [("a", 3, 11, "U", 3), ("e", 3, 5, "I", 4)]),
                    batch_id="b2", lsn_col="lsn")
        sync_mirror(spark, src, dst)
        assert _state(spark, dst) == _state(spark, src)
        assert dst.manifest().n_buckets == 2
