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

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
CDC_URLS = max(CDC_EVENTS // 20, 1000)

HEADLINE = [
    "cdc_final_state",
    "key_exists_probe",
    "cdc_changes_feed",
    "patch_upsert_fold",
    "retention_delete",
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
    "simhash_hamming_pairs",
    "embedding_topk",
    "ivf_topk",
    "asof_join",
    "sessionize",
    "url_normalize",
    "top_words",
    "boilerplate_passages",
    "remove_repeated_lines",
    "doc_repetition",
    "stratified_sample",
    "sample_k_per_stratum",
    "assign_split",
    "contamination_check",
    "near_dup_survivors",
    "token_frequency_stats",
    "pii_redact",
    "bpe_token_count",
    "chunk_documents",
    "gopher_quality",
    "quality_classifier",
    "corpus_mix",
    "dedup_apply",
    "cdf_incremental_agg",
    "cdf_follower_agg",
    "incremental_dedup",
    "time_travel_restore",
    "time_window_scan",
    "zorder_layout",
    "semantic_dedup",
    "image_resize_real",
    "audio_stats_real",
]


def main() -> None:
    from embulk_input_marketo_spark import generator
    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.plans.queries import QUERIES
    from embulk_input_marketo_spark.replay import replay
    from embulk_input_marketo_spark.session import get_spark

    # UI on for this session: the hotkey section reads per-task shuffle
    # metrics from the REST API to evidence the split operators' task bound.
    # Console progress OFF: its \r stream interleaves with the one-line JSON
    # on stdout and has twice nulled the driver's BENCH_r*.json tail-grab
    # (round-4 VERDICT item 4). The UI server itself stays on.
    spark = get_spark(
        "bench",
        cores=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session so query timings measure the plan, not startup
    spark.range(1000).count()

    # Noise defense (round-2 finding: single samples on this host swing ~3x
    # with noisy-neighbor CPU-steal windows lasting minutes): run the WHOLE
    # headline list N times interleaved and keep the per-query minimum — a
    # noise window then inflates one pass, not one query, and min-of-passes
    # recovers the true cost. bench/scaling.py solves the cross-config case;
    # this solves the round-over-round comparison case.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    from embulk_input_marketo_spark.functions.compare import content_hash

    for _ in range(repeats):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # content_hash consumes EVERY output column — a bare .count()
            # lets Catalyst prune map-only queries down to a parquet count
            # (round-2's quality_score "0.4s" measured exactly nothing)
            n, _ = content_hash(df, df.columns)
            samples[name].append(time.perf_counter() - t0)
            assert n >= 0
    per_query: dict[str, float] = {
        name: round(min(ts), 3) for name, ts in samples.items()
    }
    query_spread = {
        name: round(max(ts) / max(min(ts), 1e-9), 2)
        for name, ts in samples.items()
    }

    # ---- LSH skew-guard drop visibility -----------------------------------
    # minhash_dedup_pairs' max_bucket_size guard skips oversize buckets;
    # report how much mass the guard excluded on THIS run's corpus (same
    # fixture + parameters as the headline query) so the drops are in the
    # record, not only queryable (round-3 VERDICT item 8).
    from pyspark.sql import functions as _F

    from embulk_input_marketo_spark.operators.dedup_docs import (
        lsh_bucket_stats,
    )
    from embulk_input_marketo_spark.plans.queries import _docs_with_copies

    _ls = lsh_bucket_stats(
        _docs_with_copies(spark, SF_DIR), num_hashes=32, bands=8, shingle_n=3
    ).agg(
        _F.sum("n_buckets").alias("buckets"),
        _F.max("max_bucket").alias("max_bucket"),
        _F.sum("n_oversize_buckets").alias("oversize_buckets"),
        _F.sum("rows_in_oversize").alias("rows_dropped"),
    ).collect()[0]
    lsh_guard = {
        "buckets": int(_ls["buckets"] or 0),
        "max_bucket": int(_ls["max_bucket"] or 0),
        "oversize_buckets": int(_ls["oversize_buckets"] or 0),
        "rows_dropped": int(_ls["rows_dropped"] or 0),
    }

    # ---- semantic-dedup cell-guard visibility -----------------------------
    # semantic_dedup_pairs' max_cell_size guard (round-4 VERDICT item 2):
    # same fixture + clustering parameters as the semantic_dedup headline
    # query, recorded next to lsh_bucket_stats so the quadratic-corner guard
    # has a per-round observable just like the LSH one.
    from embulk_input_marketo_spark.functions.similarity import (
        semantic_cell_stats,
    )
    from embulk_input_marketo_spark.plans.queries import _emb_with_planted

    _sc = semantic_cell_stats(
        _emb_with_planted(spark, SF_DIR), n_cells=32, max_cell_size=1000
    ).collect()[0]
    semantic_guard = {
        "cells_used": int(_sc["n_cells_used"] or 0),
        "max_cell": int(_sc["max_cell"] or 0),
        "oversize_cells": int(_sc["n_oversize_cells"] or 0),
        "rows_dropped": int(_sc["rows_in_oversize"] or 0),
    }

    # ---- hot-key split-operator design point ------------------------------
    # A SINGLE key holding the whole frame: the plain operators' per-key
    # window puts the key's ENTIRE history into one task; the split variants
    # bound every task's input by time bucket. The design-point metric is
    # that TASK-INPUT BOUND, measured from Spark's own task metrics (max
    # per-task shuffle-read records via the UI REST API) — at this fixture
    # size a single-task sort is still sub-second, so wall time (reported
    # for transparency) favors the plain variant; the bound is what rules at
    # 10⁸+-row keys, where the one task becomes a spilling straggler while
    # 999 executors idle. r2 VERDICT "prove the split operators at their
    # design point".
    import json as _json
    import urllib.request as _url

    from pyspark.sql import functions as F

    from embulk_input_marketo_spark.operators.temporal import (
        asof_join, asof_join_split, sessionize, sessionize_split,
    )

    ui = spark.sparkContext.uiWebUrl
    _app = _json.load(_url.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def _stages():
        return _json.load(
            _url.urlopen(f"{ui}/api/v1/applications/{_app}/stages?status=COMPLETE")
        )

    def _max_task_read(from_stage: int) -> int:
        mx = 0
        for st in _stages():
            if st["stageId"] < from_stage:
                continue
            try:
                q = _json.load(_url.urlopen(
                    f"{ui}/api/v1/applications/{_app}/stages/"
                    f"{st['stageId']}/{st['attemptId']}/taskSummary?quantiles=1.0"
                ))
            except Exception:
                continue
            recs = q.get("shuffleReadMetrics", {}).get("readRecords") or [0]
            mx = max(mx, int(max(recs)))
        return mx

    hot_n = int(os.environ.get("SPARK_GRAFT_HOTKEY_EVENTS", "1000000"))

    def _fixture(n):
        hot = (
            spark.range(n)
            .select(
                F.lit(0).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") * 7 + F.col("id") % 3
                ).alias("ts"),
                F.col("id").alias("event_id"),
                (F.col("id") % 97).cast("double").alias("value"),
            )
            .repartition(CPUS)
            .cache()
        )
        quotes = (
            spark.range(n // 20)
            .select(
                F.lit(0).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") * 140
                ).alias("rts"),
                (F.col("id") % 31).cast("double").alias("price"),
            )
            .cache()
        )
        hot.count(), quotes.count()  # materialize outside the measured runs
        return hot, quotes

    def _run(df_fn, force_col):
        # the action must CONSUME the computed column: .count() lets Catalyst
        # prune the Window/join away entirely (measured: plain 'ran' in 0.3s
        # with a 32-record max task — it had optimized to nothing)
        s0 = max((s["stageId"] for s in _stages()), default=-1) + 1
        t0 = time.perf_counter()
        row = df_fn().agg(
            F.count(F.lit(1)).alias("n"), F.sum(force_col).alias("s")
        ).collect()[0]
        return round(time.perf_counter() - t0, 3), int(row["n"]), _max_task_read(s0)

    scales = [hot_n // 4, hot_n]
    ops = {
        "sessionize": {"plain_sec": [], "split_sec": [],
                       "plain_max_task_input_rows": [],
                       "split_max_task_input_rows": []},
        "asof_join": {"plain_sec": [], "split_sec": [],
                      "plain_max_task_input_rows": [],
                      "split_max_task_input_rows": []},
        "pack_documents": {"plain_sec": [], "split_sec": [],
                           "plain_max_task_input_rows": [],
                           "split_max_task_input_rows": []},
    }
    for n in scales:
        hot, quotes = _fixture(n)
        sp, c1, spx = _run(lambda: sessionize(
            hot, "user_id", "ts", gap_sec=3600, order_tiebreak="event_id"),
            "session_seq")
        ss, c2, ssx = _run(lambda: sessionize_split(
            hot, "user_id", "ts", gap_sec=3600, split_every_sec=43200,
            order_tiebreak="event_id"), "session_seq")
        ap, c3, apx = _run(lambda: asof_join(
            hot, quotes, on="user_id", left_ts="ts", right_ts="rts",
            payload_cols=["price"]), "price")
        asp, c4, aspx = _run(lambda: asof_join_split(
            hot, quotes, on="user_id", left_ts="ts", right_ts="rts",
            payload_cols=["price"], split_every_sec=43200), "price")
        # sequence packing, strata-less: the plain form's whole-corpus
        # window is the worst single-task case; the split form's largest
        # INDIVISIBLE unit is one id bucket. Measured with AQE partition
        # coalescing off and wide shuffle partitions: byte-packing merges
        # several independent buckets into one task (benign — separate sort
        # groups, re-splittable by config), which would otherwise pollute
        # the indivisible-unit metric this section exists to record.
        from embulk_input_marketo_spark.operators.sampling import (
            pack_documents, pack_documents_split,
        )
        packd = hot.select(
            F.col("event_id").alias("doc_id"),
            (F.col("event_id") % 97 + 1).alias("toks"),
        )
        old_coal = spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled", "true")
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false")
        # 128, not more: wide-enough that bucket co-location is hash
        # collisions only (20 buckets / 128 partitions), narrow enough that
        # per-task scheduling overhead doesn't dominate the wall time (a
        # 1024-partition run spent ~45 of 54 s scheduling empty tasks)
        spark.conf.set("spark.sql.shuffle.partitions", "128")
        pp, c5, ppx = _run(lambda: pack_documents(
            packd, budget_tokens=4096, token_col="toks"), "bin_id")
        ps, c6, psx = _run(lambda: pack_documents_split(
            packd, budget_tokens=4096, token_col="toks",
            ids_per_bucket=50_000), "bin_id")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coal)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        assert c1 == c2 == n and c3 == c4 == n and c5 == c6 == n
        ops["pack_documents"]["plain_sec"].append(pp)
        ops["pack_documents"]["split_sec"].append(ps)
        ops["pack_documents"]["plain_max_task_input_rows"].append(ppx)
        ops["pack_documents"]["split_max_task_input_rows"].append(psx)
        ops["sessionize"]["plain_sec"].append(sp)
        ops["sessionize"]["split_sec"].append(ss)
        ops["sessionize"]["plain_max_task_input_rows"].append(spx)
        ops["sessionize"]["split_max_task_input_rows"].append(ssx)
        ops["asof_join"]["plain_sec"].append(ap)
        ops["asof_join"]["split_sec"].append(asp)
        ops["asof_join"]["plain_max_task_input_rows"].append(apx)
        ops["asof_join"]["split_max_task_input_rows"].append(aspx)
        hot.unpersist()
        quotes.unpersist()

    # the design-point claim, ASSERTED from Spark's own task metrics (record
    # counts — deterministic, noise-immune): the plain variants funnel the
    # whole key through ONE task (max-task-input == the key's history, grows
    # linearly with it), while the split variants' bound stays flat (time-
    # bucketed partitions, byte-coalesced by AQE) — at a 10⁸-row key the
    # plain task is a spilling straggler, the split bound is unchanged
    if hot_n >= 1_000_000:  # below that AQE coalesces the split fixture into
        for op, d in ops.items():  # ~1 partition and the bound claim is moot
            p4, p1 = d["plain_max_task_input_rows"]
            s4, s1 = d["split_max_task_input_rows"]
            assert p1 >= hot_n and p1 >= 3 * p4, (op, d)   # linear in key size
            if op == "pack_documents":
                # bound = O(ids_per_bucket): a hash-partition collision may
                # co-locate a couple of (independent) buckets, never a
                # corpus-growing amount
                assert s1 <= 3 * 50_000 and s1 <= p1 // 4, (op, d)
            else:
                assert s1 <= 2 * s4 and s1 < p1 // 4, (op, d)  # flat, bounded
    hotkey = {"single_hot_key_events": scales, **ops}

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
        ).write.option(
            # ~32MB row groups → uniform scan tasks (splits align to row
            # groups; the default ~220MB groups make real task sizes lumpy)
            "parquet.block.size", str(32 * 1024 * 1024)
        ).parquet(log_path)
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
        # pipeline=True is the shipped ingest configuration (write-ahead
        # commit publish; same path bench/scaling.py times) — the commit
        # bookkeeping gap it hides is absolute, so it matters most at the
        # wide local[8] this section runs at
        report = replay(spark, log, table, n_slices=3, pipeline=True)
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
    record = {
        "metric": "change-events/sec sustained upsert throughput + headline query wall time",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cdc": cdc,
        "hotkey": hotkey,
        "cpus": CPUS,
        "cdc_cpus": cdc_cpus,
        "lsh_bucket_stats": lsh_guard,
        "semantic_cell_stats": semantic_guard,
        "query_repeats": repeats,
        "query_noise_maxmin": query_spread,
    }
    line = json.dumps(record)
    # Self-preserving record: the driver captures this print from the console
    # tail, which console noise can corrupt (it did in rounds 2 and 4). The
    # file copy under BENCH/ is the backup the per-round record never loses.
    try:
        with open(os.path.join(REPO_DIR, "BENCH", "last_bench.json"), "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
