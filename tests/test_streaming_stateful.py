"""Watermarked windowed aggregation + applyInPandasWithState stateful
operator, driven with availableNow over a parquet changelog."""

import datetime

import pyspark.sql.functions as F

from embulk_input_marketo_spark import generator
from embulk_input_marketo_spark.operators.temporal import sessionize
from embulk_input_marketo_spark.streaming.stateful import (
    session_window_counts,
    url_change_stats,
    watermarked_window_counts,
)

N = 4_000


def _write_log(spark, tmp_path):
    p = str(tmp_path / "log")
    generator.changelog(spark, N, 300, seed=21,
                        duplicate_fraction=0.0).write.parquet(p)
    return p


def test_watermarked_window_counts(spark, tmp_path):
    p = _write_log(spark, tmp_path)
    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).parquet(p)
    q = (
        watermarked_window_counts(stream, window="30 minutes", lateness="1 hour")
        .writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start"]: (r["n_events"], r["n_deletes"])
        for r in spark.sql("select * from wm_counts").collect()
    }
    # batch oracle over the same data (no late drops expected in one trigger)
    batch = spark.read.parquet(p)
    exp = {
        r["window_start"]: (r["n_events"], r["n_deletes"])
        for r in batch.groupBy(F.window("warc_ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count_if(F.col("op") == "D").alias("n_deletes"))
        .select(F.col("w.start").alias("window_start"), "n_events", "n_deletes")
        .collect()
    }
    # append mode only emits windows the watermark has closed; every emitted
    # window must match the batch truth exactly
    assert got, "no windows emitted"
    for k, v in got.items():
        assert exp[k] == v


def test_session_window_matches_batch_sessionize(spark, tmp_path):
    """The streaming gap-session operator must agree with the batch
    sessionize operator on every session it emits: same start (min ts),
    same event count, and end == batch max ts + gap."""
    p = _write_log(spark, tmp_path)
    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).parquet(p)
    gap_sec = 240
    # the generator's warc_ts values are whole seconds, so an exact-gap pair
    # (diff == 240s) is possible — there the two operators differ by design
    # (batch keeps diff <= gap, session_window's exclusive end splits it).
    # A half-second stream gap makes "diff < 240.5" ≡ "diff <= 240" on
    # integer-second data, aligning the boundary without weakening the test.
    q = (
        session_window_counts(
            stream, gap=f"{gap_sec * 1000 + 500} milliseconds",
            lateness="30 minutes",
        )
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["url"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in spark.sql("select * from sess_counts").collect()
    }
    assert got, "no sessions emitted"

    batch = sessionize(
        spark.read.parquet(p).select("url", "warc_ts", "lsn"),
        "url", "warc_ts", gap_sec=gap_sec, order_tiebreak="lsn",
    )
    exp = {
        (r["url"], r["session_start"]): (
            r["n_events"],
            r["session_end"] + datetime.timedelta(seconds=gap_sec, milliseconds=500),
        )
        for r in batch.groupBy("url", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("warc_ts").alias("session_start"),
            F.max("warc_ts").alias("session_end"),
        )
        .collect()
    }
    # append mode only emits sessions the watermark has closed; every one
    # emitted must match the batch operator exactly
    for k, v in got.items():
        assert exp[k] == v, (k, v, exp.get(k))


def test_url_change_stats_stateful(spark, tmp_path):
    p = _write_log(spark, tmp_path)
    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "2").parquet(p)
    q = (
        url_change_stats(stream)
        .writeStream.format("memory")
        .queryName("url_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    # update mode re-emits per micro-batch: take the last emit per url
    # (max versions_seen is monotone)
    rows = spark.sql(
        "select url, max(versions_seen) versions_seen, max(deletes_seen) "
        "deletes_seen, max(last_lsn) last_lsn from url_stats group by url"
    ).collect()
    got = {r["url"]: (r["versions_seen"], r["deletes_seen"], r["last_lsn"])
           for r in rows}
    batch = spark.read.parquet(p)
    exp = {
        r["url"]: (r["n"], r["d"], r["mx"])
        for r in batch.groupBy("url").agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("op") == "D").alias("d"),
            F.max("lsn").alias("mx"),
        ).collect()
    }
    assert got == exp
