"""Control-plane retry policy (R1/R2), target dispatcher (S1), config
validation (C1/C4), commit atomicity under crash-between-write-and-commit."""

import datetime

import pytest

from embulk_input_marketo_spark.dispatch import (
    ConfigError,
    TargetConfig,
    advance_sliding_window,
    dispatch,
)
from embulk_input_marketo_spark.reliability import (
    RetryGiveUpError,
    RetryPolicy,
    execute_with_retry,
)


class Transient(Exception):
    pass


class Fatal(Exception):
    pass


class RateLimited(Exception):
    pass


class TokenExpired(Exception):
    pass


def _classify(e):
    return {
        Transient: "retry",
        RateLimited: "rate_limit",
        TokenExpired: "renew",
        Fatal: "fail",
    }[type(e)]


def test_retry_transient_then_succeed():
    sleeps = []
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] < 4:
            raise Transient()
        return "ok"

    policy = RetryPolicy(classify=_classify, sleeper=sleeps.append)
    assert execute_with_retry(fn, policy) == "ok"
    assert calls["n"] == 4
    assert sleeps == [20.0, 40.0, 80.0]  # exponential, capped at 120


def test_retry_backoff_cap_and_give_up():
    sleeps = []
    policy = RetryPolicy(classify=_classify, sleeper=sleeps.append)
    with pytest.raises(RetryGiveUpError) as ei:
        execute_with_retry(lambda: (_ for _ in ()).throw(Transient()), policy)
    assert ei.value.attempts == 7
    assert sleeps == [20.0, 40.0, 80.0, 120.0, 120.0, 120.0]  # cap at max


def test_fatal_fails_fast():
    policy = RetryPolicy(classify=_classify, sleeper=lambda s: None)
    with pytest.raises(RetryGiveUpError) as ei:
        execute_with_retry(lambda: (_ for _ in ()).throw(Fatal()), policy)
    assert ei.value.attempts == 1


def test_rate_limit_waits_fixed_interval():
    sleeps = []
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RateLimited()
        return "ok"

    policy = RetryPolicy(classify=_classify, sleeper=sleeps.append)
    assert execute_with_retry(fn, policy) == "ok"
    assert sleeps == [20.0]  # marketo_limit_interval, not backoff


def test_renew_hook_then_retry():
    renewed = []
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            raise TokenExpired()
        return "ok"

    policy = RetryPolicy(classify=_classify, renew=lambda: renewed.append(1),
                         sleeper=lambda s: (_ for _ in ()).throw(AssertionError))
    assert execute_with_retry(fn, policy) == "ok"
    assert renewed == [1]  # renewal retried immediately, no sleep


# --------------------------------------------------------------------------
# dispatcher + config validation
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_log(spark):
    from embulk_input_marketo_spark import generator

    return generator.changelog(spark, 2000, 200, seed=5,
                               duplicate_fraction=0.0).cache()


def test_dispatch_all_targets_run(spark, small_log):
    for target in ["lead", "activity", "campaign", "custom_object",
                   "program_members"]:
        df = dispatch(spark, small_log, TargetConfig(target=target, from_lsn=500))
        assert df.count() == 1499, target  # half-open (500, 1999]
    df = dispatch(
        spark, small_log,
        TargetConfig(target="activity", from_lsn=-1, op_filter=["D"]),
    )
    assert df.select("op").distinct().collect()[0]["op"] == "D"


def test_dispatch_fanout_targets(spark, small_log):
    df = dispatch(
        spark, small_log,
        TargetConfig(target="all_lead_with_list_id", from_lsn=-1,
                     parent_ids=[" 7 ", "11", "", "abc"],
                     extra={"synthesize_membership": True}),
    )
    assert set(r["listId"] for r in df.select("listId").distinct().collect()) <= {"7", "11"}


def test_dispatch_fanout_without_membership_raises(spark, small_log):
    """Fabricated parent assignments are opt-in: a production caller who
    forgets the membership table gets an error, not plausible wrong output
    (round-2 VERDICT §4)."""
    with pytest.raises(ConfigError, match="membership"):
        dispatch(
            spark, small_log,
            TargetConfig(target="all_lead_with_list_id", from_lsn=-1,
                         parent_ids=["7"]),
        )


def test_dispatch_membership_table_fanout(spark, small_log):
    """With a real membership table (url → parent), a child in two lists is
    emitted once per list — the reference's concatenated per-parent exports."""
    urls = sorted(r["url"] for r in small_log.select("url").distinct().collect())[:2]
    membership = spark.createDataFrame(
        [(urls[0], "7"), (urls[0], "11"), (urls[1], "7")], ["url", "listId"]
    )
    df = dispatch(
        spark, small_log,
        TargetConfig(target="all_lead_with_list_id", from_lsn=-1,
                     parent_ids=["7", "11", "99"],
                     extra={"membership": membership}),
    )
    pairs = {(r["url"], r["listId"])
             for r in df.select("url", "listId").distinct().collect()}
    assert pairs == {(urls[0], "7"), (urls[0], "11"), (urls[1], "7")}


def test_dispatch_program_sliding_window(spark, small_log):
    e = datetime.datetime(2024, 1, 1, 0, 5, 0)
    l = datetime.datetime(2024, 1, 1, 0, 10, 0)
    df = dispatch(
        spark, small_log,
        TargetConfig(target="program", from_lsn=-1,
                     extra={"earliest_updated_at": e, "latest_updated_at": l}),
    )
    ts = [r["warc_ts"] for r in df.collect()]
    assert ts and all(e < t <= l for t in ts)
    ne, dur = advance_sliding_window(e, l)
    assert ne == l + datetime.timedelta(seconds=1)
    assert dur == datetime.timedelta(minutes=5)


def test_dispatch_program_future_window_skips(spark, small_log):
    """latest_updated_at beyond 'now' → empty ingest, state unchanged — the
    reference's skip guard (ProgramInputPlugin.java:136-157)."""
    e = datetime.datetime(2024, 1, 1, 0, 5, 0)
    l = datetime.datetime(2024, 1, 1, 0, 10, 0)
    now = datetime.datetime(2024, 1, 1, 0, 7, 0)  # before the window's end
    df = dispatch(
        spark, small_log,
        TargetConfig(target="program", from_lsn=-1,
                     extra={"earliest_updated_at": e, "latest_updated_at": l,
                            "now": now}),
    )
    assert df.count() == 0
    # same config once the clock passes the window: rows appear
    df2 = dispatch(
        spark, small_log,
        TargetConfig(target="program", from_lsn=-1,
                     extra={"earliest_updated_at": e, "latest_updated_at": l,
                            "now": l}),
    )
    assert df2.count() > 0


def test_validation_errors(spark, small_log):
    with pytest.raises(ConfigError, match="future"):
        dispatch(spark, small_log, TargetConfig(target="lead", from_lsn=10**9))
    with pytest.raises(ConfigError, match="not monotone"):
        dispatch(spark, small_log,
                 TargetConfig(target="lead", incremental_column="warc_ts"))
    with pytest.raises(ConfigError, match="unknown target"):
        dispatch(spark, small_log, TargetConfig(target="nope"))
    with pytest.raises(ConfigError, match="precede"):
        t = datetime.datetime(2024, 1, 1)
        dispatch(spark, small_log,
                 TargetConfig(target="program",
                              extra={"earliest_updated_at": t,
                                     "latest_updated_at": t}))


def test_included_fields_projection_case_insensitive(spark, small_log):
    df = dispatch(
        spark, small_log,
        TargetConfig(target="lead", from_lsn=-1,
                     included_fields=["URL", "Text", "nosuch"]),
    )
    assert df.columns == ["url", "text"]


# --------------------------------------------------------------------------
# crash between data write and manifest commit → no partial state
# --------------------------------------------------------------------------

def test_crash_before_manifest_commit_is_invisible(spark, tmp_path, small_log):
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from embulk_input_marketo_spark.lake import LakeTable, merge_batch
    from embulk_input_marketo_spark.operators.dedup import lww_dedup

    schema = T.StructType([f for f in small_log.schema.fields
                           if f.name not in ("lsn", "op", "schema_version")])
    table = LakeTable.create(str(tmp_path / "t"), schema, n_buckets=4)
    batch = lww_dedup(
        small_log.drop("schema_version").withColumnRenamed("lsn", "_lsn"),
        key_cols="url", order_cols=["warc_ts", "_lsn"],
    )

    real_write = table._write_manifest
    calls = {"n": 0}

    def crashing_write(m):
        calls["n"] += 1
        raise RuntimeError("simulated crash after data write, before commit")

    table._write_manifest = crashing_write
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_batch(spark, table, batch, batch_id="b1",
                    checkpoint={"hwm_lsn": 1999})
    table._write_manifest = real_write

    # the crash left staging files on disk but the snapshot never committed:
    assert table.current_version() == 0
    assert table.read(spark).count() == 0

    # re-running the same batch applies cleanly (no double-count, no orphans
    # referenced)
    r = merge_batch(spark, table, batch, batch_id="b1",
                    checkpoint={"hwm_lsn": 1999})
    assert r.applied
    assert table.read(spark).count() == batch.where(F.col("op") != "D").count()
