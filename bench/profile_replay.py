#!/usr/bin/env python
"""Where does the replay's wall clock go at a given parallelism?

Answers the question the scaling pairs raise but cannot answer: the wide
config's pinned cores sit ~0.85-0.90 busy while the narrow config holds
0.98 — is the idle DRIVER-SERIAL time between jobs (Amdahl: a constant
per-batch cost the wide config cannot parallelize) or IN-STAGE time
(task imbalance / stage-barrier tails / undersized final waves)?

Method: run the identical replay with the Spark event log enabled, then
parse the log into
  - per-job [start, end] driver-submission intervals,
  - per-stage task packing = sum(task run time) / (stage span × cores),
  - the gap timeline: wall time covered by NO running job = driver serial.

Usage:
  python bench/profile_replay.py --cores 8 --events 12000000 [--batches 3]

Prints one JSON line; throwaway inputs/tables live on tmpfs.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _merge_intervals(iv):
    out = []
    for s, e in sorted(iv):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--events", type=int, default=12_000_000)
    ap.add_argument("--batches", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.generator import changelog
    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay
    from embulk_input_marketo_spark.session import get_spark

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="profile_", dir=base)
    evdir = os.path.join(work, "eventlog")
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        f"profile-{args.cores}", cores=args.cores,
        shuffle_partitions=4 * args.cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": os.path.join(work, "shuffle"),
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.driver.memory": f"{4 * args.cores}g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    log_dir = os.path.join(work, "changelog")
    changelog(
        spark, args.events, max(args.events // 20, 1000), seed=42,
        partitions=args.cores * 4,
    ).write.option("parquet.block.size", str(32 * 1024 * 1024)).parquet(log_dir)
    log = spark.read.parquet(log_dir)
    schema = T.StructType(
        [f for f in log.schema.fields
         if f.name not in ("lsn", "op", "schema_version")]
    )

    # untimed warm-up replay (same rationale as bench/scaling.py)
    warm_n = max(args.events // 50, 10_000)
    warm = LakeTable.create(
        os.path.join(work, "warm"), schema, key_col="url",
        lww_major="warc_ts", n_buckets=64,
    )
    replay(spark, log.where(F.col("lsn") < warm_n), warm,
           batch_span=warm_n, extract_text_from_html=True)
    shutil.rmtree(os.path.join(work, "warm"), ignore_errors=True)

    table = LakeTable.create(
        os.path.join(work, "web_pages"), schema, key_col="url",
        lww_major="warc_ts", n_buckets=64,
    )
    mark = time.time() * 1000  # event-log timestamps are epoch millis
    t0 = time.perf_counter()
    report = replay(
        spark, log, table,
        batch_span=max(args.events // args.batches, 1),
        extract_text_from_html=True,
    )
    wall = time.perf_counter() - t0

    # the event log closes (and flushes) at spark.stop(); parse after
    spark.stop()
    jobs, stages, tasks = [], {}, {}
    paths = [
        p
        for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(evdir, pat))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(e, dict):
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerJobStart":
                    jobs.append(
                        {"id": e["Job ID"], "s": e["Submission Time"], "e": None}
                    )
                elif ev == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["id"] == e["Job ID"]:
                            j["e"] = e["Completion Time"]
                elif ev == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    if si.get("Submission Time") is None:
                        continue
                    stages[si["Stage ID"]] = {
                        "s": si["Submission Time"],
                        "e": si["Completion Time"],
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                    }
                elif ev == "SparkListenerTaskEnd":
                    ti = e["Task Info"]
                    sid = e["Stage ID"]
                    tasks.setdefault(sid, []).append(
                        ti["Finish Time"] - ti["Launch Time"]
                    )

    jobs = [j for j in jobs if j["s"] >= mark and j["e"]]
    iv = _merge_intervals([(j["s"], j["e"]) for j in jobs])
    covered = sum(e - s for s, e in iv) / 1000.0
    span = (iv[-1][1] - iv[0][0]) / 1000.0 if iv else 0.0
    gaps = span - covered  # wall time with NO job running = driver serial

    stage_rows = []
    for sid, st in sorted(stages.items()):
        if st["s"] < mark:
            continue
        tt = tasks.get(sid, [])
        stage_span = (st["e"] - st["s"]) / 1000.0
        packing = (
            sum(tt) / 1000.0 / (stage_span * args.cores)
            if stage_span > 0 else 0.0
        )
        stage_rows.append(
            {
                "stage": sid,
                "name": st["name"],
                "span_s": round(stage_span, 2),
                "tasks": st["tasks"],
                "task_time_s": round(sum(tt) / 1000.0, 2),
                "packing": round(packing, 3),
                "max_task_s": round(max(tt) / 1000.0, 2) if tt else 0.0,
            }
        )
    stage_rows.sort(key=lambda r: -r["span_s"])

    out = {
        "cores": args.cores,
        "events": report.events_applied,
        "wall_s": round(wall, 2),
        "events_per_sec": round(report.events_applied / wall, 1),
        "job_covered_s": round(covered, 2),
        "driver_gap_s": round(gaps, 2),
        "driver_gap_frac": round(gaps / span, 3) if span else None,
        "in_stage_idle_s": round(
            sum(
                r["span_s"] * args.cores - r["task_time_s"]
                for r in stage_rows
            ) / args.cores, 2,
        ),
        "top_stages": stage_rows[:10],
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
