"""Replay orchestrator: changelog window → LWW dedup → schema reconcile →
MERGE → atomic checkpoint advance.

This is the Spark re-expression of the reference's transaction lifecycle
(SURVEY.md §3.1): validate/plan window → discover schema → ingest → advance
``ConfigDiff``. One ``replay()`` call = one Embulk "transaction"; each inner
slice = one bulk-export window (``MarketoBaseBulkExtractInputPlugin.java:
140-175``), except slices here run through Spark's distributed plan instead of
a single-threaded CSV loop (the reference's data plane is one task,
``MarketoBaseInputPluginDelegate.java:104-108``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_input_marketo_spark.checkpoint import batch_id_for, resume_hwm
from embulk_input_marketo_spark.lake.merge import MergeResult, merge_batch
from embulk_input_marketo_spark.lake.table import LakeTable
from embulk_input_marketo_spark.operators.dedup import lww_dedup
from embulk_input_marketo_spark.operators.windows import bounded_scan, slice_range
from embulk_input_marketo_spark.registry import SchemaRegistry


@dataclass
class ReplayReport:
    batches: list[MergeResult] = field(default_factory=list)
    start_hwm: int = -1
    end_hwm: int = -1

    @property
    def rows_merged(self) -> int:
        """Rows written by applied merge commits (raw for mor appends,
        post-dedup for cow)."""
        return sum(b.rows_in for b in self.batches if b.applied)

    @property
    def events_applied(self) -> int:
        """Raw changelog events consumed (hwm advance) — the throughput
        numerator for the change-events/sec metric."""
        return max(self.end_hwm - self.start_hwm, 0)


def replay(
    spark: SparkSession,
    changelog: DataFrame,
    table: LakeTable,
    batch_span: int = 1_000_000,
    n_slices: int | None = None,
    salt_buckets: int | None = None,
    mode: str = "mor",
    compact_threshold: int = 8,
    extract_text_from_html: bool = False,
    registry: SchemaRegistry | None = None,
    max_batches: int | None = None,
    on_batch: Callable[[MergeResult], Any] | None = None,
    prefetch: bool = False,
) -> ReplayReport:
    """Replay the changelog into the table from the committed checkpoint.

    - The job-start snapshot of ``max(lsn)`` clamps the run (C1): events that
      arrive mid-replay wait for the next run.
    - The window splits into ≤``batch_span`` half-open slices (C2); each is
      LWW-deduped, schema-reconciled and merged with an idempotent batch_id —
      killing the process anywhere and re-running converges (C3/C7).
    - ``prefetch`` (default OFF — measured and rejected at bench shape):
      pipeline slice k+1's changelog SCAN under slice k's merge (persist +
      materialize on a background thread, kicked shortly AFTER the merge
      job is submitted so FIFO keeps the merge's priority). Measured
      same-window A/B at 8 cores / 10M events: occupancy ROSE 0.80→0.88
      but throughput FELL ~330k→~280k ev/s — on local tmpfs the scan is
      already a memcpy, so the cache materialization adds a full extra
      copy of the decoded slice (html included) to a memory-bandwidth
      budget the write path needs more. The knob stays because the
      tradeoff inverts when the scan is REMOTE (S3/HDFS object reads
      under compute is the classic ingest pipeline overlap); the cache
      holds only RAW slice rows, so it is valid under schema
      reconcile/renames (both apply downstream) and drops as each slice
      commits.
    """
    import threading
    import time as _time

    hwm = resume_hwm(table)
    row = changelog.agg(F.max("lsn").alias("mx")).collect()[0]
    max_lsn = row["mx"] if row["mx"] is not None else -1
    if max_lsn <= hwm:
        # skip-batch guard (C7): nothing new, keep state
        return ReplayReport(start_hwm=hwm, end_hwm=hwm)
    if n_slices is not None:
        # derive the span from the lsn bounds this function already computed —
        # callers wanting "K slices" need no extra count() scan of their own
        batch_span = max(-(-(max_lsn - hwm) // n_slices), 1)

    slices = list(slice_range(hwm, max_lsn, batch_span))
    prefetched: dict[tuple[int, int], DataFrame] = {}

    def _kick_prefetch(nxt: tuple[int, int], delay: float = 2.0) -> None:
        # persist, then materialize AFTER a short delay: the current slice's
        # merge job must reach the scheduler first (FIFO gives the earlier
        # job priority whenever it has pending tasks, so the prefetch only
        # ever fills slots the merge releases — gaps and straggler tails)
        df = bounded_scan(changelog, *nxt).persist()
        prefetched[nxt] = df

        def run() -> None:
            _time.sleep(delay)
            try:
                df.count()
            except Exception:
                pass  # cancelled/failed prefetch degrades to a direct scan

        threading.Thread(target=run, daemon=True).start()

    report = ReplayReport(start_hwm=hwm, end_hwm=hwm)
    for i, (lo, hi) in enumerate(slices):
        if max_batches is not None and len(report.batches) >= max_batches:
            break
        if registry is not None:
            registry.reconcile(table, up_to_lsn=hi)

        window_df = prefetched.get((lo, hi)) or bounded_scan(changelog, lo, hi)
        will_process_next = (
            prefetch
            and i + 1 < len(slices)
            and (max_batches is None or len(report.batches) + 1 < max_batches)
        )
        if will_process_next and slices[i + 1] not in prefetched:
            _kick_prefetch(slices[i + 1])
        m = table.manifest()
        cur_fields = m.current_schema().fields
        # inbound rows may still carry pre-rename column names (a source that
        # lags the registry); translate through the rename log
        for r in m.renames:
            if r["old"] in window_df.columns and r["new"] not in window_df.columns:
                window_df = window_df.withColumnRenamed(r["old"], r["new"])
        # project to current schema (+op); unknown inbound columns dropped,
        # missing ones padded with typed nulls, types cast — the
        # included_fields ∩ describe discipline
        # (LeadServiceResponseMapperBuilder.java:47-76)
        proj = []
        inbound = dict(zip(window_df.columns, window_df.schema.fields))
        for f_ in cur_fields:
            if f_.name in inbound:
                c = F.col(f_.name)
                if inbound[f_.name].dataType != f_.dataType:
                    c = c.cast(f_.dataType)
                proj.append(c.alias(f_.name))
            else:
                proj.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        batch = window_df.select(*proj, F.col("op"), F.col("lsn").alias("_lsn"))
        derive = None
        if extract_text_from_html and "text" in [f.name for f in cur_fields]:
            # the engine's own text derivation (input_hint §2.8): Arrow
            # pandas UDF over the html payload; output must be byte-identical
            # per url to the oracle's expected text
            # arrow transport: the Arrow-native twin of the pandas UDF —
            # same kernel, same bytes, but no per-row python objects on
            # either side of the worker exchange (textops.extract_text_arrow)
            from embulk_input_marketo_spark.functions.textops import (
                extract_text_arrow as extract_text,
            )

            if mode == "mor":
                # defer to the write tasks (merge_batch derive=) so the
                # bucket shuffle carries a null placeholder, not a second
                # copy of ~the html bytes — shuffle width is the engine's
                # memory-bandwidth hot spot at high core counts
                derive = {"text": extract_text(F.col("html"))}
                batch = batch.withColumn("text", F.lit(None).cast("string"))
            else:
                batch = batch.withColumn("text", extract_text(F.col("html")))
        if mode == "cow":
            # CoW folds base data every commit — pre-reduce to one row per
            # key first so the union the merge reduces over stays small
            batch = lww_dedup(
                batch,
                key_cols=m.key_col,
                order_cols=[m.lww_major, "_lsn"],
                salt_buckets=salt_buckets,
            )
        # mor: append raw (LSM-style); the threshold compaction + read-time
        # reduce own the dedup work, amortized and parallel
        result = merge_batch(
            spark,
            table,
            batch,
            batch_id=batch_id_for(table.path, lo, hi),
            salt_buckets=salt_buckets,
            mode=mode,
            compact_threshold=compact_threshold,
            checkpoint={"hwm_lsn": hi},
            window=(lo, hi),
            lineage={"lsn_lo": lo, "lsn_hi": hi, "source": "changelog"},
            derive=derive,
        )
        report.batches.append(result)
        if (lo, hi) in prefetched:
            prefetched.pop((lo, hi)).unpersist(blocking=False)
        if result.applied:
            report.end_hwm = hi
        if on_batch:
            on_batch(result)
    for df in prefetched.values():  # early exits (max_batches) leak nothing
        df.unpersist(blocking=False)
    return report
