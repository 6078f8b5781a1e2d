"""Column-level patch merge (partial-image CDC upserts) — operators/patch.py.

The fold must keep, per column, the latest non-null write; a delete resets
the row, so writes from a previous incarnation never leak through it.
"""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_input_marketo_spark.operators.patch import patch_fold


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)


def _log(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=_ts(t), lsn=lsn, op=op, a=a, b=b)
         for (k, t, lsn, op, a, b) in rows],
        "k long, ts timestamp, lsn long, op string, a string, b long",
    )


class TestPatchFold:
    def test_partial_images_merge_per_column(self, spark):
        df = _log(spark, [
            (1, 1, 1, "U", "a1", 10),
            (1, 2, 2, "U", None, 20),   # carries only b
            (1, 3, 3, "U", "a3", None), # carries only a
        ])
        out = patch_fold(df, "k", ["ts", "lsn"]).collect()
        assert len(out) == 1
        r = out[0]
        # row version is the latest upsert; columns fold independently
        assert (r.lsn, r.a, r.b) == (3, "a3", 20)

    def test_delete_resets_columns(self, spark):
        df = _log(spark, [
            (1, 1, 1, "U", "old", 10),
            (1, 2, 2, "D", None, None),
            (1, 3, 3, "U", None, 30),   # resurrect, but never writes a
        ])
        r = patch_fold(df, "k", ["ts", "lsn"]).collect()[0]
        # 'old' must NOT leak through the delete
        assert (r.a, r.b) == (None, 30)

    def test_dead_key_absent(self, spark):
        df = _log(spark, [
            (1, 1, 1, "U", "x", 1),
            (1, 2, 2, "D", None, None),
            (2, 1, 3, "D", None, None),  # only ever deleted
        ])
        assert patch_fold(df, "k", ["ts", "lsn"]).count() == 0

    def test_order_is_major_then_lsn(self, spark):
        # same ts: higher lsn wins; later ts beats higher lsn
        df = _log(spark, [
            (1, 5, 9, "U", "ts5lsn9", 1),
            (1, 5, 2, "U", "ts5lsn2", 2),
            (1, 4, 99, "U", "ts4lsn99", 3),
        ])
        r = patch_fold(df, "k", ["ts", "lsn"]).collect()[0]
        assert r.a == "ts5lsn9" and r.lsn == 9

    def test_no_delete_and_explicit_patch_cols(self, spark):
        df = _log(spark, [(1, 1, 1, "U", "a", 5)])
        out = patch_fold(df, "k", ["ts", "lsn"], patch_cols=["b"])
        assert out.columns == ["k", "ts", "lsn", "b"]
        assert out.collect()[0].b == 5

    def test_single_exchange_plan(self, spark):
        df = _log(spark, [(1, 1, 1, "U", "a", 5), (2, 2, 2, "U", "b", 6)])
        plan = patch_fold(df, "k", ["ts", "lsn"])._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1, plan

    def test_delete_after_everything_kills_even_with_candidates(self, spark):
        df = _log(spark, [
            (1, 1, 1, "U", "a", 1),
            (1, 9, 9, "D", None, None),
        ])
        assert patch_fold(df, "k", ["ts", "lsn"]).count() == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_patch_fold_matches_brute_force(spark, seed):
    """Random interleavings vs a driver-side reference fold."""
    import random

    rnd = random.Random(seed)
    rows = []
    lsn = 0
    for _ in range(300):
        lsn += 1
        k = rnd.randrange(8)
        t = rnd.randrange(20)
        if rnd.random() < 0.15:
            rows.append((k, t, lsn, "D", None, None))
        else:
            rows.append((
                k, t, lsn, "U",
                None if rnd.random() < 0.4 else f"a{lsn}",
                None if rnd.random() < 0.4 else lsn,
            ))
    df = _log(spark, rows)
    got = {
        r.k: (r.lsn, r.a, r.b)
        for r in patch_fold(df, "k", ["ts", "lsn"]).collect()
    }

    # reference: replay in (ts, lsn) order per key
    exp = {}
    for k, t, lsn_, op, a, b in sorted(rows, key=lambda r: (r[1], r[2])):
        if op == "D":
            exp.pop(k, None)
            continue
        cur = exp.get(k, (None, None, None))
        exp[k] = (lsn_, a if a is not None else cur[1],
                  b if b is not None else cur[2])
    assert got == exp
