"""Metadata tables (Iceberg's table$snapshots / table$files shape):
the operator-facing audit surface, answered from manifests alone."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake.merge import compact_buckets, merge_batch
from embulk_input_marketo_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, urls, base_lsn=0):
    t0 = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (u, t0 + datetime.timedelta(seconds=i), f"t{u}", "I", base_lsn + i)
            for i, u in enumerate(urls)
        ],
        "url string, warc_ts timestamp, text string, op string, _lsn long",
    )


def test_snapshots_and_files_tables(tmp_path, spark):
    t = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=4,
    )
    merge_batch(spark, t, _batch(spark, [f"u{i}" for i in range(40)]), "b1")
    merge_batch(
        spark, t, _batch(spark, [f"v{i}" for i in range(10)], 100), "b2"
    )
    compact_buckets(spark, t, [0, 1, 2, 3])

    snaps = t.snapshots_df(spark).orderBy("version").collect()
    assert [r["operation"] for r in snaps] == [
        "create", "merge", "merge", "compact"
    ]
    assert [r["parent"] for r in snaps] == [None, 0, 1, 2]
    assert snaps[1]["rows_in"] == 40 and snaps[2]["rows_in"] == 10

    files = t.files_df(spark)
    m = t.manifest()
    expected = sum(len(m.files[b]) for b in set(m.files))
    rows = files.collect()
    assert len(rows) == expected
    # post-compaction: every live file is the reduced current generation
    # and carries manifest key/time stats
    assert all(r["reduced"] for r in rows)
    assert all(r["kmin"] is not None and r["tmin"] is not None for r in rows)
    # per-bucket counts agree with the maintenance advisor's view
    by_bucket = {
        r["bucket"]: r["n"]
        for r in files.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert by_bucket == {
        int(b): n for b, n in t.maintenance_plan()["file_counts"].items()
    }

    # time travel: the pre-compaction snapshot still lists its generations
    files_v2 = t.files_df(spark, version=2).collect()
    assert len(files_v2) >= len(rows)
    assert not all(r["reduced"] for r in files_v2)


def test_files_table_empty_and_legacy(tmp_path, spark):
    t = LakeTable.create(
        str(tmp_path / "e"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    assert t.files_df(spark).count() == 0
    assert t.snapshots_df(spark).collect()[0]["operation"] == "create"
