"""Physical-plan audits: the optimizations we rely on at 100 TB must be
visible in the plan, not assumed — range predicates push into the parquet
scan, column pruning reaches ReadSchema, small dims broadcast, the LWW
aggregate has a partial (map-side) phase, and bucket pruning bounds merge
reads to touched buckets' files."""

import pyspark.sql.functions as F

from embulk_input_marketo_spark.operators.windows import bounded_scan


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_bounded_scan_pushes_range_predicate(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumnRenamed(
        "event_id", "lsn"
    )
    df = bounded_scan(ev, 100, 500).select("lsn", "event_type")
    plan = _optimized(df)
    # range filter reaches the parquet source
    assert "PushedFilters" in plan
    assert "GreaterThan(event_id,100)" in plan
    assert "LessThanOrEqual(event_id,500)" in plan
    # column pruning: only the two referenced columns are read
    assert "ReadSchema: struct<event_id:bigint,event_type:string>" in plan


def test_fanout_join_broadcasts_dimension(spark, sf_dir):
    from embulk_input_marketo_spark.plans.queries import q_fanout_enrichment

    plan = _plan(q_fanout_enrichment(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact side


def test_lww_dedup_has_partial_aggregation(spark):
    from embulk_input_marketo_spark.operators.dedup import lww_dedup

    df = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"),
        F.col("id").alias("ts"),
        F.col("id").alias("lsn"),
        F.lit("v").alias("v"),
    )
    out = lww_dedup(df, "k", ["ts", "lsn"])
    out.collect()  # finalize the adaptive plan
    plan = _plan(out)
    # partial + final aggregate pair = map-side combine is active, which is
    # the first-line hot-key defense (a hot key sends ≤1 row per map task)
    assert "partial_max_by" in plan
    assert plan.lower().count("hashaggregate") >= 2 or plan.count("SortAggregate") >= 2


def test_merge_reads_only_touched_buckets(spark, tmp_path):
    """Bucket pruning: a batch touching 1 url must read at most 1 bucket's
    files, not the table."""
    from pyspark.sql import types as T

    from embulk_input_marketo_spark import generator
    from embulk_input_marketo_spark.lake import LakeTable, merge_batch
    from embulk_input_marketo_spark.operators.dedup import lww_dedup

    log = generator.changelog(spark, 2_000, 300, seed=9, duplicate_fraction=0.0)
    schema = T.StructType(
        [f for f in log.schema.fields if f.name not in ("lsn", "op", "schema_version")]
    )
    table = LakeTable.create(str(tmp_path / "t"), schema, n_buckets=32)
    full = lww_dedup(log.drop("schema_version").withColumnRenamed("lsn", "_lsn"),
                     "url", ["warc_ts", "_lsn"])
    merge_batch(spark, table, full, batch_id="seed", mode="cow",
                checkpoint={"hwm_lsn": 1999})

    # no window checkpoint on the probe batch: a window ending at the
    # already-committed hwm would (correctly) no-op under the hwm gate
    one = full.orderBy("url").limit(1)
    r = merge_batch(spark, table, one, batch_id="one", mode="cow")
    assert r.touched_buckets == 1
    m = table.manifest()
    # only one bucket's file list changed to the new snapshot
    changed = [b for b, es in m.files.items()
               if any(e["v"] == m.version for e in es)]
    assert len(changed) == 1


def test_vacuum_drops_old_tombstones_only(spark, tmp_path):
    import datetime

    from pyspark.sql import types as T

    from embulk_input_marketo_spark import generator
    from embulk_input_marketo_spark.lake import LakeTable, merge_batch
    from embulk_input_marketo_spark.lake.merge import vacuum_tombstones
    from embulk_input_marketo_spark.operators.dedup import lww_dedup

    log = generator.changelog(spark, 3_000, 200, seed=13)
    schema = T.StructType(
        [f for f in log.schema.fields if f.name not in ("lsn", "op", "schema_version")]
    )
    table = LakeTable.create(str(tmp_path / "t"), schema, n_buckets=8)
    batch = lww_dedup(log.drop("schema_version").withColumnRenamed("lsn", "_lsn"),
                      "url", ["warc_ts", "_lsn"])
    merge_batch(spark, table, batch, batch_id="b", checkpoint={"hwm_lsn": 2999})

    before = table.read(spark).count()
    raw = table.read(spark, include_internal=True)
    tombs_before = raw.where(F.col("_deleted")).count()
    assert tombs_before > 0

    # vacuum with a watermark beyond all data: every tombstone reclaimable
    vacuum_tombstones(spark, table, datetime.datetime(2030, 1, 1))
    raw2 = table.read(spark, include_internal=True)
    assert raw2.where(F.col("_deleted")).count() == 0
    assert table.read(spark).count() == before  # live rows untouched
