"""Streaming completions of SURVEY.md §2.7: watermark + windowed aggregation
for late data, and a custom stateful operator via applyInPandasWithState.

The reference silently drops late updates (createdAt-filtered windows, C8)
and keeps its only state in a config diff. Here:
- `watermarked_window_counts`: tumbling event-time windows with an explicit
  lateness watermark — late events inside the watermark are aggregated,
  beyond it dropped deterministically (a declared policy instead of an
  accident of the filter column).
- `url_change_stats`: per-url running change statistics (versions seen,
  deletes seen, last lsn) maintained across micro-batches in GroupState —
  Arrow-batched, no per-row Python outside the batches. This is the
  "custom stateful operator" slot (applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def watermarked_window_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    lateness: str = "2 hours",
) -> DataFrame:
    """Tumbling window counts with a lateness watermark (streaming-safe
    append-mode aggregate)."""
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("op") == "D").alias("n_deletes"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_deletes")
    )


def session_window_counts(
    stream: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    gap: str = "6 hours",
    lateness: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``operators/temporal.sessionize``: gap-based session
    windows via ``F.session_window`` + a lateness watermark (append-mode
    emits a session once the watermark passes its close).

    Boundary note: ``session_window`` treats an event exactly ``gap`` after
    the previous one as a NEW session (the window end ``last+gap`` is
    exclusive), while the batch operator keeps it (only ``diff > gap`` opens
    a session); identical on data without exact-gap spacings."""
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


STATS_OUTPUT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("versions_seen", T.LongType()),
        T.StructField("deletes_seen", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
    ]
)

STATS_STATE = T.StructType(
    [
        T.StructField("versions", T.LongType()),
        T.StructField("deletes", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
    ]
)


def _update_url_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    versions, deletes, last_lsn = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        versions += len(pdf)
        deletes += int((pdf["op"] == "D").sum())
        if len(pdf):
            last_lsn = max(last_lsn, int(pdf["lsn"].max()))
    state.update((versions, deletes, last_lsn))
    yield pd.DataFrame(
        {
            "url": [key[0]],
            "versions_seen": [versions],
            "deletes_seen": [deletes],
            "last_lsn": [last_lsn],
        }
    )


def url_change_stats(stream: DataFrame) -> DataFrame:
    """Per-url running change stats across micro-batches (GroupState)."""
    return (
        stream.select("url", "op", "lsn")
        .groupBy("url")
        .applyInPandasWithState(
            _update_url_stats,
            outputStructType=STATS_OUTPUT,
            stateStructType=STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
