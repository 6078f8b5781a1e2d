"""Incremental window computation & slicing (SURVEY.md §2.3 C1/C2).

Carries the reference's semantics:
- clamp: ``to = min(from + fetch_span, job_start_snapshot)`` — never read the
  future (``MarketoBaseBulkExtractInputPlugin.java:112-123``; job start
  stamped once per transaction at ``MarketoBaseInputPluginDelegate.java:71-75``).
  Here the "job start snapshot" is ``max_lsn`` observed once at replay start:
  events appended while a replay is running are left for the next run.
- slicing: split a window into bounded chunks; the reference slices to ≤30-day
  ranges with the next chunk starting at prev_end + 1 second so every boundary
  record lands in exactly one slice (``MarketoUtils.sliceRange:100-113``).
  Our lsn slices are half-open ``(lo, hi]`` — same exactly-once containment,
  integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clamp_window(hwm_lsn: int, fetch_span: int, max_lsn_snapshot: int) -> tuple[int, int]:
    """(lo, hi] for the next batch; hi clamped at the job-start snapshot."""
    hi = min(hwm_lsn + fetch_span, max_lsn_snapshot)
    return hwm_lsn, hi


def slice_range(lo: int, hi: int, max_span: int) -> list[tuple[int, int]]:
    """Split half-open (lo, hi] into consecutive half-open slices of at most
    ``max_span``. Adjacent slices share a boundary but half-open bounds mean
    each lsn appears in exactly one slice (the reference's +1s rule, exact)."""
    if hi <= lo:
        return []
    out = []
    cur = lo
    while cur < hi:
        nxt = min(cur + max_span, hi)
        out.append((cur, nxt))
        cur = nxt
    return out


def bounded_scan(changelog: DataFrame, lo: int, hi: int, lsn_col: str = "lsn") -> DataFrame:
    """Bounded scan of the log for window (lo, hi] — the replacement for the
    reference's paginated pull / bulk-export job (``MarketoServiceImpl.java:
    49-68``). The range predicate pushes down to the parquet scan (min/max
    row-group pruning; partition pruning when the log is lsn-partitioned)."""
    return changelog.where((F.col(lsn_col) > lo) & (F.col(lsn_col) <= hi))
