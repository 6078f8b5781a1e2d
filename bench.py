#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "cdc": {...}}

Two parts:
1. headline queries from the engine's query surface at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. the CDC replay throughput bench: a deterministic generated changelog
   (seeded, no external data) replayed through dedup+MERGE into a lake table
   — events/sec is the engine's authoritative metric (BASELINE.md §2).

Scaling-efficiency evidence across two parallelism levels is produced by
bench/scaling.py (writes BENCH/BASELINE.md); this file is the per-round
single-config harness.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
CDC_URLS = max(CDC_EVENTS // 20, 1000)

HEADLINE = [
    "cdc_final_state",
    "lww_dedup",
    "incremental_window",
    "coerce_props",
    "fanout_enrichment",
    "pricing_rollup",
    "tumbling_window",
    "token_count",
    "quality_score",
    "lang_id",
    "extract_text",
    "exact_dedup",
    "minhash_dedup_pairs",
    "embedding_topk",
    "asof_join",
    "sessionize",
    "url_normalize",
]


def main() -> None:
    from embulk_input_marketo_spark import generator
    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.plans.queries import QUERIES
    from embulk_input_marketo_spark.replay import replay
    from embulk_input_marketo_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session so query timings measure the plan, not startup
    spark.range(1000).count()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        per_query[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    # ---- CDC replay throughput (the authoritative metric) -----------------
    # The replay gets its own session in the shipped ingest configuration
    # (BENCH/BASELINE.md): parallelism sized to the host's measured linear
    # region — this VM saturates above ~8-16 threads, local[32] is SLOWER
    # than local[8] on the ingest path — finer scan splits so task waves
    # pack evenly, shuffle + lake on tmpfs (the sandbox virtio disk
    # throttles intermittently; a real cluster has NVMe + a distributed FS),
    # and salt off (map-side partial aggregation absorbs the hot keys).
    spark.stop()
    cdc_cpus = int(os.environ.get("SPARK_GRAFT_CDC_CPUS", str(min(CPUS, 8))))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench_cdc_", dir=base)
    spark = get_spark(
        "bench-cdc", cores=cdc_cpus,
        shuffle_partitions=4 * cdc_cpus,
        extra_conf={
            "spark.local.dir": os.path.join(work, "shuffle"),
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        log_path = os.path.join(work, "changelog")
        generator.changelog(
            spark, CDC_EVENTS, CDC_URLS, seed=42, partitions=cdc_cpus * 4
        ).write.parquet(log_path)
        log = spark.read.parquet(log_path)

        from pyspark.sql import types as T

        schema = T.StructType(
            [f for f in log.schema.fields if f.name not in ("lsn", "op", "schema_version")]
        )
        table = LakeTable.create(
            os.path.join(work, "web_pages"), schema,
            key_col="url", lww_major="warc_ts", n_buckets=64,
        )
        t0 = time.perf_counter()
        report = replay(spark, log, table, n_slices=3)
        cdc_sec = time.perf_counter() - t0
        events = report.events_applied
        cdc = {
            "events": events,
            "rows_merged": report.rows_merged,
            "sec": round(cdc_sec, 3),
            "events_per_sec": round(events / cdc_sec, 1),
            "batches": len(report.batches),
        }
        per_query["cdc_replay"] = round(cdc_sec, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(per_query.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "change-events/sec sustained upsert throughput + headline query wall time",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc": cdc,
                "cpus": CPUS,
                "cdc_cpus": cdc_cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
