"""Unit tests: as-of join, sessionization, URL canonicalization."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_input_marketo_spark.functions import urlops
from embulk_input_marketo_spark.operators.temporal import (
    asof_join,
    asof_join_split,
    sessionize,
    sessionize_split,
)


def _left(spark):
    return spark.createDataFrame(
        [
            Row(k="a", ts=10, ev=1),
            Row(k="a", ts=20, ev=2),
            Row(k="a", ts=35, ev=3),
            Row(k="b", ts=10, ev=4),   # no right rows for b at/before 10
            Row(k="b", ts=100, ev=5),
        ]
    )


def _right(spark):
    return spark.createDataFrame(
        [
            Row(k="a", rts=5, px=1.0),
            Row(k="a", rts=20, px=2.0),   # tie with left ts=20 → matches
            Row(k="a", rts=30, px=3.0),
            Row(k="b", rts=50, px=9.0),
        ]
    )


class TestAsofJoin:
    def test_backward(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="rts",
        )
        got = {r["ev"]: (r["px"], r["asof_matched_ts"]) for r in out.collect()}
        assert got == {
            1: (1.0, 5),     # nearest at-or-before 10 is rts=5
            2: (2.0, 20),    # tie on the timestamp itself matches
            3: (3.0, 30),
            4: (None, None),  # left outer: no candidate → nulls
            5: (9.0, 50),
        }

    def test_forward(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="rts",
            direction="forward",
        )
        got = {r["ev"]: r["px"] for r in out.collect()}
        assert got == {1: 2.0, 2: 2.0, 3: None, 4: 9.0, 5: None}

    def test_tolerance(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="rts",
            tolerance_sec=5,
        )
        got = {r["ev"]: r["px"] for r in out.collect()}
        # ev=1: dist 5 ≤ 5 keeps; ev=3: dist 5 keeps; ev=5: dist 50 → null
        assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: None, 5: None}

    def test_tiebreak_largest_wins(self, spark):
        left = spark.createDataFrame([Row(k="a", ts=10, ev=1)])
        right = spark.createDataFrame(
            [Row(k="a", rts=10, px=1.0, uid=7), Row(k="a", rts=10, px=2.0, uid=9)]
        )
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload_cols=["px"], right_tiebreak="uid",
        )
        assert out.collect()[0]["px"] == 2.0

    def test_timestamp_columns(self, spark):
        left = spark.createDataFrame(
            [("a", "2024-01-01 00:00:30")], ["k", "ts"]
        ).select("k", F.to_timestamp("ts").alias("ts"))
        right = spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", 5.0)], ["k", "rts", "px"]
        ).select("k", F.to_timestamp("rts").alias("rts"), "px")
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            tolerance_sec=29,
        )
        assert out.collect()[0]["px"] is None  # 30s > 29s tolerance
        out2 = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            tolerance_sec=30,
        )
        assert out2.collect()[0]["px"] == 5.0

    def test_single_shuffle_plan(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="rts",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the whole operator is ONE hash exchange (the window's) — no join,
        # no second shuffle
        assert plan.count("Exchange hashpartitioning") == 1

    def test_bad_direction(self, spark):
        with pytest.raises(ValueError):
            asof_join(
                _left(spark), _right(spark), on="k", left_ts="ts",
                right_ts="rts", direction="sideways",
            )


def _skewed_frames(spark):
    """A hot key holding most rows plus several cold keys; timestamps wrap
    across many 100s buckets; duplicate right timestamps exercise the
    tiebreak."""
    lrows = [
        Row(k=("hot" if i % 4 else f"k{i % 7}"), ts=(i * 37) % 1000, ev=i)
        for i in range(400)
    ]
    rrows = [
        Row(k=("hot" if j % 3 else f"k{j % 7}"), rts=(j * 53) % 1000,
            px=float(j), uid=j)
        for j in range(200)
    ]
    return spark.createDataFrame(lrows), spark.createDataFrame(rrows)


class TestAsofJoinSplit:
    def _assert_same(self, base, split):
        cols = sorted(base.columns)
        assert sorted(split.columns) == cols
        b = sorted(tuple(str(r[c]) for c in cols) for r in base.collect())
        s = sorted(tuple(str(r[c]) for c in cols) for r in split.collect())
        assert b == s

    def test_row_identical_to_plain(self, spark):
        l, r = _skewed_frames(spark)
        self._assert_same(
            asof_join(l, r, on="k", left_ts="ts", right_ts="rts",
                      payload_cols=["px"], right_tiebreak="uid"),
            asof_join_split(l, r, on="k", left_ts="ts", right_ts="rts",
                            payload_cols=["px"], split_every_sec=100,
                            right_tiebreak="uid"),
        )

    def test_row_identical_with_tolerance(self, spark):
        l, r = _skewed_frames(spark)
        self._assert_same(
            asof_join(l, r, on="k", left_ts="ts", right_ts="rts",
                      payload_cols=["px"], right_tiebreak="uid",
                      tolerance_sec=40),
            asof_join_split(l, r, on="k", left_ts="ts", right_ts="rts",
                            payload_cols=["px"], split_every_sec=100,
                            right_tiebreak="uid", tolerance_sec=40),
        )

    def test_no_task_holds_whole_key(self, spark):
        l, r = _skewed_frames(spark)
        out = asof_join_split(
            l, r, on="k", left_ts="ts", right_ts="rts",
            payload_cols=["px"], split_every_sec=100,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the event-level window partitions by (key, bucket), never by the
        # bare key — only the O(buckets)-sized boundary sweep uses bare-key
        # partitioning
        assert "hashpartitioning(k#" in plan and "_tb" in plan


class TestSessionize:
    def test_gap_boundary_strict(self, spark):
        df = spark.createDataFrame(
            [
                Row(k="u", ts=0, ev=0),
                Row(k="u", ts=100, ev=1),    # gap == 100 → same session
                Row(k="u", ts=201, ev=2),    # gap 101 > 100 → new session
                Row(k="u", ts=301, ev=3),    # gap == 100 → same
                Row(k="v", ts=0, ev=4),      # new key → its own session 1
            ]
        )
        out = sessionize(df, "k", "ts", gap_sec=100, order_tiebreak="ev")
        got = {r["ev"]: r["session_seq"] for r in out.collect()}
        assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 1}

    def test_two_windows_one_shuffle(self, spark):
        df = spark.createDataFrame([Row(k="u", ts=0, ev=0)])
        out = sessionize(df, "k", "ts", gap_sec=10, order_tiebreak="ev")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestSessionizeSplit:
    def _frames(self, spark):
        # hot key with bursty arrivals: bursts inside the gap, pauses beyond
        # it, sessions crossing bucket boundaries (split == gap == 50)
        rows = []
        t = 0
        for i in range(300):
            t += (7 if i % 5 else 90)        # bursts of 4, then a 90s pause
            rows.append(Row(k=("hot" if i % 4 else f"k{i % 3}"), ts=t, ev=i))
        return spark.createDataFrame(rows)

    def test_numbering_identical_to_plain(self, spark):
        df = self._frames(spark)
        plain = sessionize(df, "k", "ts", gap_sec=50, order_tiebreak="ev")
        split = sessionize_split(
            df, "k", "ts", gap_sec=50, split_every_sec=50, order_tiebreak="ev"
        )
        p = {(r["k"], r["ev"]): r["session_seq"] for r in plain.collect()}
        s = {(r["k"], r["ev"]): r["session_seq"] for r in split.collect()}
        assert p == s

    def test_split_smaller_than_gap_rejected(self, spark):
        df = self._frames(spark)
        with pytest.raises(ValueError, match="must be >="):
            sessionize_split(df, "k", "ts", gap_sec=100, split_every_sec=50)

    def test_event_window_partitions_by_bucketed_key(self, spark):
        df = self._frames(spark)
        out = sessionize_split(df, "k", "ts", gap_sec=50, split_every_sec=50)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_tb" in plan  # local sessions run per (key, bucket)


URL_CASES = [
    # (raw, normalized)
    ("HTTP://WWW.ExAmple.COM:80/A/b?utm_source=x&q=1&utm_medium=y#f",
     "http://example.com/A/b?q=1"),
    ("https://Site.org:443/p?q=1&fbclid=zzz", "https://site.org/p?q=1"),
    ("https://site.org:80/p", "https://site.org:80/p"),     # non-default kept
    ("http://site.org:8080/p", "http://site.org:8080/p"),
    ("https://www.site.org/p?utm_campaign=only", "https://site.org/p"),
    ("http://a.b/p?utm_a=1&utm_b=2&q=3", "http://a.b/p?q=3"),
    ("http://a.b/p?gclid=4", "http://a.b/p"),
    ("http://a.b/PaTh/Q?Query=MixedCase", "http://a.b/PaTh/Q?Query=MixedCase"),
]


class TestUrlNormalize:
    def test_cases(self, spark):
        df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["u"])
        out = df.select("u", urlops.normalize_url(F.col("u")).alias("n")).collect()
        want = dict(URL_CASES)
        for r in out:
            assert r["n"] == want[r["u"]], r["u"]

    def test_idempotent(self, spark):
        df = spark.createDataFrame([(r,) for r, _ in URL_CASES], ["u"])
        out = df.select(
            urlops.normalize_url(F.col("u")).alias("n1"),
            urlops.normalize_url(urlops.normalize_url(F.col("u"))).alias("n2"),
        ).collect()
        for r in out:
            assert r["n1"] == r["n2"]

    def test_host(self, spark):
        df = spark.createDataFrame(
            [("https://site.org:8080/p?q=1",), ("http://a.b/",)], ["u"]
        )
        got = [r["h"] for r in df.select(urlops.url_host(F.col("u")).alias("h")).collect()]
        assert got == ["site.org", "a.b"]
