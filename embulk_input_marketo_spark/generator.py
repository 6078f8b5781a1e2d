"""Deterministic, fully-distributed changelog/web-page fixture generator.

Shapes per FIXTURES.md A1/A2: a CDC changelog of insert/update/delete events
over Common-Crawl-style web pages. Everything is derived column-wise from
``spark.range`` + ``xxhash64`` — no Python RNG, no driver loops — so the same
(seed, n_events) pair yields byte-identical data at any parallelism, which is
what the two-cluster-size scaling benchmark requires.

Skew: a configurable fraction of events lands on a small set of hot urls
(zipf-ish via exponential transform of a uniform hash), exercising the salted
LWW dedup and AQE skew-join paths.

Out-of-order: a fraction of events carries a ``warc_ts`` earlier than events
with larger ``lsn`` (late data). ``lsn`` stays the unique monotone watermark
column — the ``createdAt`` analogue the reference insists on for incremental
filtering (``MarketoBaseBulkExtractInputPlugin.java:78-84,102-106``); the
business time ``warc_ts`` is the ``updatedAt`` analogue.

Duplicate delivery: a fraction of rows is re-emitted verbatim (same lsn) to
model an at-least-once source; the LWW reducer must absorb them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"

# Schema-evolution script (FIXTURES.md A4): v2 adds text_encoding mid-stream.
SCHEMA_V2_FRACTION = 0.5  # events in the last half of the lsn range are v2


def _u01(*cols) -> "F.Column":
    """Deterministic uniform(0,1) from arbitrary columns via xxhash64."""
    h = F.xxhash64(*cols)
    # map signed 64-bit to [0,1); shift to avoid sign issues
    return (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)


def changelog(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    seed: int = 42,
    hot_urls: int = 8,
    hot_fraction: float = 0.3,
    delete_fraction: float = 0.05,
    out_of_order_fraction: float = 0.2,
    duplicate_fraction: float = 0.02,
    partitions: int | None = None,
) -> DataFrame:
    """Build the changelog DataFrame.

    Columns (FIXTURES.md A2): lsn, op, url, warc_ts, html, text, lang,
    text_encoding (null before evolution point), schema_version.
    """
    s = F.lit(seed)
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumnRenamed("id", "lsn")

    # --- key (url) with skew -------------------------------------------------
    u_key = _u01(F.col("lsn"), s, F.lit("key"))
    u_hot = _u01(F.col("lsn"), s, F.lit("hot"))
    # cold ids: log-skewed over [hot_urls, n_urls) — smaller ids more popular
    cold_id = (
        F.pow(F.lit(float(max(n_urls - hot_urls, 1))), u_key).cast("long")
        + F.lit(hot_urls)
    )
    hot_id = (u_key * hot_urls).cast("long")
    url_id = F.when(u_hot < F.lit(hot_fraction), hot_id).otherwise(
        F.least(cold_id, F.lit(n_urls - 1))
    )
    df = df.withColumn("url_id", url_id)
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://example-"),
            (F.col("url_id") % 1000).cast("string"),
            F.lit(".org/page/"),
            F.col("url_id").cast("string"),
        ),
    )

    # --- op ------------------------------------------------------------------
    u_op = _u01(F.col("lsn"), s, F.lit("op"))
    df = df.withColumn(
        "op",
        F.when(u_op < F.lit(delete_fraction), F.lit("D"))
        .when(u_op < F.lit(delete_fraction + 0.3), F.lit("I"))
        .otherwise(F.lit("U")),
    )

    # --- business time with bounded out-of-order jitter ----------------------
    u_late = _u01(F.col("lsn"), s, F.lit("late"))
    jitter = F.when(
        u_late < F.lit(out_of_order_fraction),
        -(u_late * 36000).cast("long"),  # up to 10h late
    ).otherwise(F.lit(0))
    df = df.withColumn(
        "warc_ts",
        F.to_timestamp(F.lit(BASE_TS))
        + F.make_interval(secs=(F.col("lsn") + jitter).cast("double")),
    )

    # --- payload: deterministic pseudo page ----------------------------------
    body = F.concat_ws(
        " ",
        F.lit("page"),
        F.col("url_id").cast("string"),
        F.lower(F.hex(F.xxhash64(F.col("lsn"), s, F.lit("w1")))),
        F.lower(F.hex(F.xxhash64(F.col("lsn"), s, F.lit("w2")))),
        F.lower(F.hex(F.xxhash64(F.col("url_id"), F.col("lsn"), s))),
    )
    is_del = F.col("op") == "D"
    # html is built so that functions.textops.extract_text(html) == text,
    # byte-for-byte (empty title, body == text): the engine re-derives text
    # from html during replay and the oracle checks it against this column
    df = df.withColumn(
        "html",
        F.when(is_del, F.lit(None).cast("binary")).otherwise(
            F.encode(
                F.concat(
                    F.lit("<html><head><title></title></head><body><p>"),
                    body,
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            )
        ),
    )
    df = df.withColumn("text", F.when(is_del, F.lit(None).cast("string")).otherwise(body))
    langs = ["en", "de", "fr", "es", "zh", "ja", "pt", "ru", "it", "nl"]
    df = df.withColumn(
        "lang",
        F.when(is_del, F.lit(None).cast("string")).otherwise(
            F.get(
                F.array(*[F.lit(x) for x in langs]),
                (
                    (F.xxhash64(F.col("url_id"), s, F.lit("lang")) % len(langs))
                    + len(langs)
                ).cast("int")
                % len(langs),
            )
        ),
    )

    # --- scripted schema evolution (v2 adds text_encoding) -------------------
    evo_lsn = int(n_events * (1 - SCHEMA_V2_FRACTION))
    df = df.withColumn(
        "schema_version",
        F.when(F.col("lsn") >= F.lit(evo_lsn), F.lit(2)).otherwise(F.lit(1)),
    )
    df = df.withColumn(
        "text_encoding",
        F.when(
            (F.col("schema_version") >= 2) & ~is_del, F.lit("utf-8")
        ).otherwise(F.lit(None).cast("string")),
    )

    df = df.drop("url_id")

    # --- duplicate delivery (at-least-once source) ----------------------------
    if duplicate_fraction > 0:
        dups = df.where(_u01(F.col("lsn"), s, F.lit("dup")) < F.lit(duplicate_fraction))
        df = df.unionAll(dups)

    return df.select(
        "lsn", "op", "url", "warc_ts", "html", "text", "lang",
        "text_encoding", "schema_version",
    )


def expected_final_state(changelog_df: DataFrame) -> DataFrame:
    """Independent oracle: per url, the row with max (warc_ts, lsn); urls whose
    last writer is a delete are absent. Used only by tests — the engine itself
    never calls this."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("lsn"))
    latest = (
        changelog_df.dropDuplicates(["lsn"])
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.where(F.col("op") != "D").select(
        "url", "warc_ts", "html", "text", "lang", "text_encoding"
    )
