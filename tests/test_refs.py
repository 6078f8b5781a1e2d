"""Snapshot tags (lake/refs.py) + bloom saturation reporting."""

import datetime

import pytest
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import refs
from embulk_input_marketo_spark.lake.bloom import bloom_health
from embulk_input_marketo_spark.lake.merge import merge_batch
from embulk_input_marketo_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, urls, base=0):
    t0 = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (u, t0 + datetime.timedelta(seconds=base + i), f"t{u}", "I",
             base + i)
            for i, u in enumerate(urls)
        ],
        "url string, warc_ts timestamp, text string, op string, _lsn long",
    )


@pytest.fixture()
def table(tmp_path, spark):
    t = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=4, bloom_bits=1 << 14,
    )
    for i in range(4):
        merge_batch(
            spark, t, _batch(spark, [f"u{i}-{j}" for j in range(10)], i * 100),
            f"b{i}",
        )
    return t


def test_tag_set_resolve_read(spark, table):
    v = table.current_version()
    refs.set_tag(table, "audit-q3")
    merge_batch(spark, table, _batch(spark, ["late"], 10**6), "late")
    assert refs.resolve(table, "audit-q3") == v
    tagged = refs.read_at(table, spark, "audit-q3")
    assert tagged.where("url = 'late'").count() == 0
    assert table.read(spark).where("url = 'late'").count() == 1


def test_tag_immutability_and_validation(table):
    refs.set_tag(table, "prod")
    with pytest.raises(refs.RefError):
        refs.set_tag(table, "prod", version=0)
    refs.set_tag(table, "prod", version=1, replace=True)
    assert refs.resolve(table, "prod") == 1
    with pytest.raises(refs.RefError):
        refs.set_tag(table, "_bad")
    with pytest.raises(refs.RefError):
        refs.resolve(table, "missing")
    with pytest.raises(FileNotFoundError):
        refs.set_tag(table, "ghost", version=99)
    refs.delete_tag(table, "prod")
    assert "prod" not in refs.list_refs(table)


def test_expiry_retains_tagged_snapshots(spark, table):
    refs.set_tag(table, "keep-me", version=2)
    for i in range(8):
        merge_batch(spark, table, _batch(spark, [f"x{i}"], 10**5 + i), f"xx{i}")
    table.expire_snapshots(keep_last=2)
    # version 2 survives expiry because the tag pins it...
    m = table.manifest(2)
    assert m.version == 2
    assert refs.read_at(table, spark, "keep-me").count() > 0
    # ...while untagged old versions are gone
    with pytest.raises(FileNotFoundError):
        table.manifest(1)
    # dropping the tag releases the snapshot to the next expiry
    refs.delete_tag(table, "keep-me")
    table.expire_snapshots(keep_last=2)
    with pytest.raises(FileNotFoundError):
        table.manifest(2)


def test_bloom_health_reports_saturation(spark, table):
    h = bloom_health(table)
    assert h["enabled"] and h["m_bits"] == 1 << 14 and h["k"] == 7
    assert h["unbloomed_buckets"] == []
    assert 0 <= h["worst_est_fpr"] < 0.01  # 2^14 bits over ~10 keys/bucket
    total_keys = sum(b["keys"] for b in h["buckets"].values())
    assert total_keys == 40  # every written key counted exactly once


def test_bloom_health_disabled(tmp_path, spark):
    t = LakeTable.create(
        str(tmp_path / "nb"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=2,
    )
    assert bloom_health(t) == {"enabled": False}
