"""Bucket-count evolution (rehash): the table moves to a new hash layout in
one committed rewrite; state, point lookups, and subsequent merges all
follow the new bucket count."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.lake.merge import merge_batch, rehash_buckets

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
        (r.url, r.warc_ts, r.value) for r in table.read(spark).collect()
    }


def test_rehash_preserves_state_and_scales_lookup(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    merge_batch(
        spark, table,
        _batch(spark, [(f"u{i}", i, i, "I", i) for i in range(64)]),
        batch_id="b1", lsn_col="lsn",
    )
    merge_batch(  # add a delete + an update so tombstone/LWW carry over
        spark, table,
        _batch(spark, [("u0", 100, 0, "D", 100), ("u1", 100, 999, "U", 101)]),
        batch_id="b2", lsn_col="lsn",
    )
    before = _state(table, spark)

    rehash_buckets(spark, table, 16)
    m = table.manifest()
    assert m.n_buckets == 16
    assert m.summary["operation"] == "rehash"
    assert _state(table, spark) == before

    # point lookup prunes against the NEW layout: 1 of 16 buckets
    hit = table.lookup(spark, "u17")
    files_scanned = {f.rsplit("/", 2)[-2] for f in hit.inputFiles()}
    assert len(files_scanned) <= 1  # one _b=N partition dir
    assert [r.value for r in hit.collect()] == [17.0]

    # the tombstone survived the rehash: a LATE event older than the delete
    # must still lose
    merge_batch(
        spark, table,
        _batch(spark, [("u0", 50, 123, "U", 102)]),  # ts 50 < delete's 100
        batch_id="b3", lsn_col="lsn",
    )
    assert "u0" not in {r.url for r in table.read(spark).collect()}


def test_merge_after_rehash_uses_new_buckets(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    merge_batch(
        spark, table,
        _batch(spark, [(f"u{i}", i, i, "I", i) for i in range(8)]),
        batch_id="b1", lsn_col="lsn",
    )
    rehash_buckets(spark, table, 8)
    merge_batch(
        spark, table,
        _batch(spark, [(f"v{i}", 10 + i, i, "I", 100 + i) for i in range(8)]),
        batch_id="b2", lsn_col="lsn",
    )
    m = table.manifest()
    # new data landed in buckets computed with the NEW count: bucket ids
    # present must be valid under n=8 (some > 1 proves it isn't the old n=2)
    bucket_ids = {int(b) for b in set(m.files)}
    assert all(0 <= b < 8 for b in bucket_ids) and max(bucket_ids) > 1
    assert {r.url for r in table.read(spark).collect()} == (
        {f"u{i}" for i in range(8)} | {f"v{i}" for i in range(8)}
    )


def test_cdf_across_rehash_is_exact(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    merge_batch(
        spark, table,
        _batch(spark, [("a", 1, 1, "I", 1), ("b", 1, 2, "I", 2)]),
        batch_id="b1", lsn_col="lsn",
    )
    v1 = table.current_version()
    rehash_buckets(spark, table, 8)
    # rehash alone is logically a no-op: the CDF must be empty
    assert table.changes(spark, v1).count() == 0
    # and a real change after the rehash still diffs exactly
    merge_batch(
        spark, table,
        _batch(spark, [("a", 2, 9, "U", 3)]),
        batch_id="b2", lsn_col="lsn",
    )
    ch = {(r.url, r["_change"]) for r in table.changes(spark, v1).collect()}
    assert ch == {("a", "update")}


def test_maintenance_plan_reports_upkeep(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=1,  # every batch hits the same bucket → generations grow
    )
    for i in range(4):
        merge_batch(
            spark, table,
            _batch(spark, [(f"u{i}", i, i, "I", i)]),
            batch_id=f"b{i}", lsn_col="lsn",
        )
    plan = table.maintenance_plan(compact_generations=4, expire_keep_last=2)
    assert plan["compact_buckets"] == [0]       # 4 MoR generations piled up
    assert plan["expirable_snapshots"] == [0, 1, 2]
    assert plan["stale_staged"] == []
    assert plan["generation_histogram"] == {4: 1}
    assert plan["file_counts"][0] >= 4
    # size skew from the manifest's running bucket_bytes: one bucket holds
    # everything, so max == mean and the top list names it
    skew = plan["size_skew"]
    assert skew["tracked"] and skew["buckets"] == 1
    assert skew["max_bytes"] == skew["mean_bytes"] > 0
    assert skew["top_buckets"][0]["bucket"] == 0

    from embulk_input_marketo_spark.lake.merge import compact_buckets

    compact_buckets(spark, table, plan["compact_buckets"])
    after = table.maintenance_plan(compact_generations=4, expire_keep_last=2)
    assert after["compact_buckets"] == []       # compaction clears the flag
