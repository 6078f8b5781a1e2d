"""Row-level DELETE WHERE (lake/merge.delete_where) — the retention/GDPR
path, distinct from CDC 'D' events arriving through the log.

Contract under test:
- matching live rows disappear from reads; non-matching rows untouched;
- the tombstone keeps the deleted winner's (lww_major, _lsn) order key, so
  late/duplicate deliveries of OLDER events never resurrect the row, while
  a genuinely newer event does;
- payload columns of the tombstone are scrubbed to NULL (the bytes are
  gone, not hidden) — only key and lww_major survive for the guard;
- only buckets holding matching rows are rewritten (pointer diff);
- a predicate evaluating to NULL means "not matched", never a dropped row;
- no-op predicates commit nothing.
"""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.lake.merge import delete_where, merge_batch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            Row(url=u, warc_ts=_ts(ts), value=float(v) if v is not None else None,
                lang=lang, op=op, lsn=lsn)
            for (u, ts, v, lang, op, lsn) in rows
        ],
        T.StructType(
            SCHEMA.fields
            + [T.StructField("op", T.StringType()),
               T.StructField("lsn", T.LongType())]
        ),
    )


def _make(tmp_path, spark, n_buckets=4):
    table = LakeTable.create(
        str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
        n_buckets=n_buckets,
    )
    merge_batch(
        spark, table,
        _batch(spark, [
            ("a", 10, 1.0, "en", "I", 1),
            ("b", 10, 9.0, "de", "I", 2),
            ("c", 10, 9.5, "en", "I", 3),
            ("d", 10, 0.5, None, "I", 4),
        ]),
        batch_id="b1", lsn_col="lsn",
    )
    return table


class TestDeleteWhere:
    def test_deletes_matching_keeps_rest(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        v, n = delete_where(spark, table, F.col("value") > 5.0)
        assert n == 2
        assert v == table.current_version()
        left = {r.url for r in table.read(spark).collect()}
        assert left == {"a", "d"}

    def test_string_predicate_and_null_semantics(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        # lang = 'en' is NULL for d — d must survive
        _, n = delete_where(spark, table, "lang = 'en'")
        assert n == 2
        assert {r.url for r in table.read(spark).collect()} == {"b", "d"}

    def test_no_match_is_no_commit(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        v0 = table.current_version()
        v, n = delete_where(spark, table, F.col("value") > 99.0)
        assert (v, n) == (v0, 0)
        assert table.current_version() == v0

    def test_tombstone_guards_late_arrivals(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        delete_where(spark, table, F.col("url") == "b")
        # late delivery: older major, lower lsn — must NOT resurrect b
        merge_batch(
            spark, table,
            _batch(spark, [("b", 5, 7.0, "de", "U", 0)]),
            batch_id="late", lsn_col="lsn",
        )
        assert {r.url for r in table.read(spark).collect()} == {"a", "c", "d"}

    def test_newer_event_resurrects(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        delete_where(spark, table, F.col("url") == "b")
        merge_batch(
            spark, table,
            _batch(spark, [("b", 20, 2.0, "fr", "U", 9)]),
            batch_id="new", lsn_col="lsn",
        )
        rows = {r.url: r.value for r in table.read(spark).collect()}
        assert rows["b"] == 2.0

    def test_payload_scrubbed_on_tombstone(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        delete_where(spark, table, F.col("url") == "b")
        raw = table.read(spark, include_internal=True)
        tomb = [r for r in raw.collect() if r.url == "b" and r._deleted]
        assert tomb, "tombstone row must exist"
        r = tomb[0]
        assert r.value is None and r.lang is None
        assert r.warc_ts == _ts(10)  # order key preserved

    def test_only_matching_buckets_rewrite(self, spark, tmp_path):
        table = _make(tmp_path, spark, n_buckets=8)
        m0 = table.manifest()
        before = {b: tuple(e["path"] for e in m0.files.get(b, []))
                  for b in map(str, range(8))}
        _, n = delete_where(spark, table, F.col("url") == "c")
        assert n == 1
        m1 = table.manifest()
        changed = [
            b for b in map(str, range(8))
            if tuple(e["path"] for e in m1.files.get(b, [])) != before[b]
        ]
        assert len(changed) == 1

    def test_idempotent_rerun(self, spark, tmp_path):
        table = _make(tmp_path, spark)
        delete_where(spark, table, F.col("value") > 5.0)
        v1 = table.current_version()
        v2, n = delete_where(spark, table, F.col("value") > 5.0)
        assert (v2, n) == (v1, 0)
