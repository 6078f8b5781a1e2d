"""Pagination-as-bounded-scan adapters + the preview/mock source.

The reference's three pagination styles (SURVEY.md §2.1 S5/S6/S7) all
collapse to range predicates over the log once the source is a table:

- token pagination (``MarketoRestClient.java:426-466``): the opaque
  nextPageToken is exactly a source offset → an lsn cursor.
- offset pagination (``:397-425``): offset/maxReturn → lsn range chunks.
- filter-range hybrid for custom objects (``:508-572``): consecutive
  int-ranges of 300 driven by ``spark.range`` — kept as an operator because
  it is useful for driving per-range work at scale.

Each adapter returns (DataFrame, next_cursor) so callers that genuinely need
page-at-a-time behavior (previews, backfill drivers) keep the loop shape
while full scans stay one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def page_by_token(
    df: DataFrame, cursor: int, batch_size: int = 300, order_col: str = "lsn"
) -> tuple[DataFrame, int | None]:
    """Token-paginated read: one page of ``batch_size`` ordered records after
    ``cursor``; next token = max(order_col) of the page. The scan prunes by
    the range predicate — no offset skip-scan.

    NOT a hot-path operator: the orderBy+limit is a global top-N plus a
    second (tiny, pruned) agg job per page — fine for the preview/backfill
    loop shape it exists for, wrong for bulk ingest. The bulk path is ONE
    declarative bounded_scan over the whole window (see operators/windows)."""
    page = (
        df.where(F.col(order_col) > cursor)
        .orderBy(order_col)
        .limit(batch_size)
    )
    rows = page.agg(F.max(order_col).alias("mx"), F.count(F.lit(1)).alias("n")).collect()[0]
    next_cursor = int(rows["mx"]) if rows["n"] and rows["n"] >= batch_size else None
    return page, next_cursor


def page_by_offset(
    df: DataFrame, offset: int, max_return: int = 200, order_col: str = "lsn"
) -> tuple[DataFrame, int | None]:
    """Offset pagination: 'more' inferred from a full page — the reference's
    moreResult heuristic (``MarketoRestClient.java:397-425``)."""
    page = (
        df.where((F.col(order_col) >= offset) & (F.col(order_col) < offset + max_return))
    )
    n = page.count()
    return page, (offset + max_return) if n >= max_return else None


def id_range_batches(spark: SparkSession, lo: int, hi: int, step: int = 300) -> DataFrame:
    """The custom-object filter-range driver: consecutive int ranges of
    ``step`` (``MarketoRestClient.java:508-572``) as a distributed range
    table — joinable against any keyed source to fan out per-range work."""
    return spark.range(lo, hi, step).select(
        F.col("id").alias("range_lo"),
        F.least(F.col("id") + step - 1, F.lit(hi - 1)).alias("range_hi"),
    )


def preview_rows(spark: SparkSession, n: int = 15) -> DataFrame:
    """Mock preview source (S10): n deterministic typed rows — the
    ``importMockPreviewData`` analogue (``MarketoUtils.java:224-271``)."""
    return spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("https://preview.example/"), F.col("id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>preview "), F.col("id"), F.lit("</body></html>")), "UTF-8").alias("html"),
        F.concat(F.lit("preview "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
