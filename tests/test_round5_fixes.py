"""Round-5 VERDICT/ADVICE fixes, each with a dedicated regression test.

Covers (r4 VERDICT "next round" numbering):
  2. semantic-dedup max_cell_size guard + semantic_cell_stats observability
  6. strict integer coercion (Long.parseLong semantics,
     AllStringJacksonServiceRecord.java:50-55)
  ADVICE low: chunk_documents whitespace normalization (tab/newline-padded
     text must not emit empty tokens or phantom chunks)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_input_marketo_spark.functions.similarity import (
    semantic_cell_stats,
    semantic_dedup,
    semantic_dedup_pairs,
)


def _giant_cell_fixture(spark):
    """Embeddings engineered so cell assignment produces ONE giant cell
    (60 near-identical vectors — a degenerate boilerplate-template
    embedding) plus a small legitimate duplicate pair elsewhere."""
    rows = []
    # giant cell: 60 copies of [1, 0] with a tiny deterministic wiggle that
    # keeps cosine ~1.0 (all same cell, all above threshold)
    for i in range(60):
        rows.append((i, [1.0, 0.000001 * i]))
    # small cell: an orthogonal pair that must still be found
    rows.append((1000, [0.0, 1.0]))
    rows.append((1001, [0.0, 1.0]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


class TestSemanticCellGuard:
    def test_guard_skips_giant_cell_keeps_small(self, spark):
        emb = _giant_cell_fixture(spark)
        pairs = semantic_dedup_pairs(
            emb, n_cells=4, threshold=0.95, max_cell_size=10
        ).collect()
        ids = {r.left_id for r in pairs} | {r.right_id for r in pairs}
        # the giant cell's 60 members never reach pair generation...
        assert not any(i < 100 for i in ids)
        # ...but the small cell's pair survives the guard
        assert {1000, 1001} <= ids

    def test_guard_off_finds_giant_cell_pairs(self, spark):
        emb = _giant_cell_fixture(spark)
        pairs = semantic_dedup_pairs(
            emb, n_cells=4, threshold=0.95, max_cell_size=None
        )
        n = pairs.where(F.col("left_id") < 100).count()
        assert n == 60 * 59 // 2  # full quadratic expansion when unguarded

    def test_guarded_members_survive_as_singletons(self, spark):
        emb = _giant_cell_fixture(spark)
        out = semantic_dedup(
            emb, n_cells=4, threshold=0.95, max_cell_size=10
        ).collect()
        assert len(out) == 62  # nobody silently vanishes
        giant = [r for r in out if r.vec_id < 100]
        assert all(r.keep and r.component_id == r.vec_id for r in giant)
        small = {r.vec_id: r for r in out if r.vec_id >= 1000}
        assert small[1000].keep and not small[1001].keep
        assert small[1001].component_id == 1000

    def test_cell_stats_report_the_drop(self, spark):
        emb = _giant_cell_fixture(spark)
        row = semantic_cell_stats(
            emb, n_cells=4, max_cell_size=10
        ).collect()[0]
        assert row.n_oversize_cells == 1
        assert row.rows_in_oversize == 60
        assert row.max_cell == 60
        # and with the guard wide open nothing reports as dropped
        row2 = semantic_cell_stats(
            emb, n_cells=4, max_cell_size=None
        ).collect()[0]
        assert row2.n_oversize_cells == 0 and row2.rows_in_oversize == 0
        assert row2.n_cells_used == row.n_cells_used


class TestStrictLongCoercion:
    """`Long.parseLong` rejects non-integral strings; `cast('long')` used to
    accept "12.5" → 12 (r4 VERDICT item 6). The engine now gates long
    targets on an integer-literal rlike before the cast."""

    CASES = [
        ("12", 12),
        ("-7", -7),
        ("+7", 7),       # Long.parseLong accepts an explicit plus sign
        ("12.5", None),  # Long.parseLong: NumberFormatException
        ("12.0", None),
        ("1e3", None),
        (" 12", None),   # parseLong does not trim
        ("12 ", None),
        ("abc", None),
        ("", None),      # '' → null upstream (reference null semantics)
        ("null", None),
        (None, None),
    ]

    def test_long_parse_lattice(self, spark):
        from embulk_input_marketo_spark.operators.coerce import coerce_column

        df = spark.createDataFrame(
            [(s,) for s, _ in self.CASES], "s: string"
        ).select(coerce_column("s", "integer").alias("v"))
        got = [r.v for r in df.collect()]
        assert got == [want for _, want in self.CASES]

    def test_double_still_accepts_decimals(self, spark):
        from embulk_input_marketo_spark.operators.coerce import coerce_column

        df = spark.createDataFrame(
            [("12.5",), ("3",), ("abc",)], "s: string"
        ).select(coerce_column("s", "currency").alias("v"))
        assert [r.v for r in df.collect()] == [12.5, 3.0, None]


class TestCowBloomFastPath:
    """r4 VERDICT item 8: cow merges probe the per-bucket key blooms first;
    a bucket whose incoming keys are all provably absent appends a new
    generation instead of reading + rewriting its base data."""

    SCHEMA = None  # built lazily (needs pyspark types)

    def _table(self, tmp_path, spark, name="t"):
        from pyspark.sql import types as T

        from embulk_input_marketo_spark.lake.table import LakeTable

        schema = T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("text", T.StringType()),
            ]
        )
        return LakeTable.create(
            str(tmp_path / name), schema, key_col="url",
            lww_major="warc_ts", n_buckets=4, bloom_bits=1 << 14,
        )

    def _batch(self, spark, rows, base=0):
        import datetime

        def ts(i):
            return datetime.datetime(2026, 1, 1) + datetime.timedelta(
                seconds=i
            )

        return spark.createDataFrame(
            [
                (u, ts(base + i), f"t{u}@{base}", op, base + i)
                for i, (u, op) in enumerate(rows)
            ],
            "url string, warc_ts timestamp, text string, op string,"
            " _lsn long",
        )

    def _spy_read(self, table):
        calls = []
        orig = table.read

        def spy(*a, **kw):
            calls.append(kw.get("buckets"))
            return orig(*a, **kw)

        table.read = spy
        return calls

    def test_all_new_keys_read_zero_base_files(self, tmp_path, spark):
        from embulk_input_marketo_spark.lake.merge import merge_batch

        t = self._table(tmp_path, spark)
        merge_batch(
            spark, t, self._batch(spark, [(f"a{i}", "I") for i in range(20)]),
            "b1", mode="cow",
        )
        calls = self._spy_read(t)
        r = merge_batch(
            spark, t,
            self._batch(spark, [(f"b{i}", "I") for i in range(20)], base=100),
            "b2", mode="cow", bloom_fast_path=True,
        )
        assert calls == [], "all-new-keys batch must not read base data"
        assert r.applied and r.compacted_buckets == 0
        m = t.manifest()
        assert m.summary["bloom_skipped_buckets"] == m.summary["touched_buckets"] > 0
        # skipped buckets carry the old generation PLUS the appended one
        assert any(len(m.files[b]) == 2 for b in set(m.files))
        urls = {r.url for r in t.read(spark).collect()}
        assert urls == {f"a{i}" for i in range(20)} | {
            f"b{i}" for i in range(20)
        }

    def test_mixed_batch_folds_only_hit_buckets(self, tmp_path, spark):
        from embulk_input_marketo_spark.lake.merge import merge_batch

        t = self._table(tmp_path, spark)
        merge_batch(
            spark, t, self._batch(spark, [(f"a{i}", "I") for i in range(20)]),
            "b1", mode="cow",
        )
        calls = self._spy_read(t)
        merge_batch(
            spark, t,
            self._batch(
                spark,
                [("a5", "U")] + [(f"c{i}", "I") for i in range(10)],
                base=200,
            ),
            "b2", mode="cow", bloom_fast_path=True,
        )
        assert len(calls) == 1 and len(calls[0]) >= 1  # only hit buckets read
        rows = {r.url: r.text for r in t.read(spark).collect()}
        assert rows["a5"] == "ta5@200"  # the update won LWW through the fold
        assert rows["a4"] == "ta4@0"
        assert set(rows) == {f"a{i}" for i in range(20)} | {
            f"c{i}" for i in range(10)
        }

    def test_absent_key_delete_appends_tombstone(self, tmp_path, spark):
        from embulk_input_marketo_spark.lake.merge import merge_batch

        t = self._table(tmp_path, spark)
        merge_batch(
            spark, t, self._batch(spark, [(f"a{i}", "I") for i in range(8)]),
            "b1", mode="cow",
        )
        calls = self._spy_read(t)
        merge_batch(
            spark, t,
            self._batch(spark, [("zzz-absent", "D"), ("new1", "I")], base=50),
            "b2", mode="cow", bloom_fast_path=True,
        )
        assert calls == []
        urls = {r.url for r in t.read(spark).collect()}
        assert "zzz-absent" not in urls and "new1" in urls

    def test_default_off_always_folds(self, tmp_path, spark):
        from embulk_input_marketo_spark.lake.merge import merge_batch

        t = self._table(tmp_path, spark)
        merge_batch(
            spark, t, self._batch(spark, [(f"a{i}", "I") for i in range(20)]),
            "b1", mode="cow",
        )
        calls = self._spy_read(t)
        merge_batch(
            spark, t,
            self._batch(spark, [(f"b{i}", "I") for i in range(20)], base=100),
            "b2", mode="cow",
        )
        assert len(calls) == 1

    def test_generation_bound_forces_fold(self, tmp_path, spark):
        from embulk_input_marketo_spark.lake.merge import merge_batch

        t = self._table(tmp_path, spark)
        # 9 disjoint-key cow merges with the fast path: generations pile up
        # per bucket until the ≥8 bound routes a bucket back through the
        # fold, collapsing it to one generation again
        for j in range(9):
            merge_batch(
                spark, t,
                self._batch(
                    spark, [(f"k{j}_{i}", "I") for i in range(12)],
                    base=j * 100,
                ),
                f"b{j}", mode="cow", bloom_fast_path=True,
            )
        m = t.manifest()
        gens = {b: len(m.files[b]) for b in set(m.files)}
        assert all(n <= 8 for n in gens.values()), gens
        assert t.read(spark).count() == 9 * 12

    def test_equivalence_with_plain_cow(self, tmp_path, spark):
        from embulk_input_marketo_spark.functions.compare import (
            assert_same_state,
        )
        from embulk_input_marketo_spark.lake.merge import merge_batch

        batches = [
            [(f"a{i}", "I") for i in range(15)],
            [(f"b{i}", "I") for i in range(15)] + [("a3", "U")],
            [("a3", "D"), ("b2", "U")] + [(f"c{i}", "I") for i in range(5)],
        ]
        t_fast = self._table(tmp_path, spark, "fast")
        t_plain = self._table(tmp_path, spark, "plain")
        for j, rows in enumerate(batches):
            b = self._batch(spark, rows, base=j * 100)
            merge_batch(
                spark, t_fast, b, f"b{j}", mode="cow", bloom_fast_path=True
            )
            merge_batch(spark, t_plain, b, f"b{j}", mode="cow")
        assert_same_state(t_fast.read(spark), t_plain.read(spark))


class TestSubmitReplayReport:
    """r4 VERDICT item 10: the spark-submit entrypoint surfaces the
    operational reports (maintenance_plan + bloom_health) behind --report."""

    def test_report_flag_appends_health_sections(self, spark, tmp_path):
        import submit_replay
        from embulk_input_marketo_spark import generator

        log_dir = str(tmp_path / "log")
        generator.changelog(spark, 1_000, 100, seed=9).write.parquet(log_dir)
        table_dir = str(tmp_path / "t")
        out = submit_replay.main([
            "--changelog", log_dir, "--table", table_dir,
            "--create", "--slices", "2", "--report",
        ])
        assert out["events_applied"] == 1_000
        assert "compact_buckets" in out["maintenance"]
        assert out["maintenance"]["version"] >= 1
        # table created without bloom_bits: health must say so, not crash
        assert out["bloom_health"] == {"enabled": False}
        # without the flag the sections stay out of the record
        out2 = submit_replay.main(
            ["--changelog", log_dir, "--table", table_dir]
        )
        assert "maintenance" not in out2 and "bloom_health" not in out2


class TestSubmitReplayBloomFastPath:
    """The bloom fast path wired end-to-end: submit_replay --create
    --bloom-bits ... --mode cow --bloom-fast-path, resumed with a second
    disjoint-key changelog segment that must skip every base read."""

    def test_end_to_end_cow_bloom_replay(self, spark, tmp_path):
        import submit_replay
        from embulk_input_marketo_spark import generator
        from embulk_input_marketo_spark.lake.table import LakeTable

        log1 = str(tmp_path / "log1")
        generator.changelog(spark, 1_000, 100, seed=3).write.parquet(log1)
        table_dir = str(tmp_path / "t")
        out = submit_replay.main([
            "--changelog", log1, "--table", table_dir, "--create",
            "--bloom-bits", str(1 << 14), "--n-buckets", "4",
            "--slices", "1", "--mode", "cow", "--bloom-fast-path",
            "--report",
        ])
        assert out["events_applied"] == 1_000
        assert out["bloom_health"]["enabled"] is True
        # second segment: same generator, keys shifted out of range by a
        # url prefix via lsn continuation — build disjoint keys directly
        t = LakeTable(table_dir)
        before = t.read(spark).count()
        import datetime

        rows = [
            (f"brand-new-{i}",
             datetime.datetime(2026, 2, 1) + datetime.timedelta(seconds=i),
             float(i), "{}", "I", 1_000 + i)  # contiguous lsns after log1
            for i in range(50)
        ]
        log2 = str(tmp_path / "log2")
        spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, value double, props string,"
            " op string, lsn long",
        ).write.parquet(log2)
        calls = []
        orig = LakeTable.read

        def spy(self, *a_, **kw):
            if kw.get("include_internal"):
                calls.append(kw.get("buckets"))
            return orig(self, *a_, **kw)

        LakeTable.read = spy
        try:
            out2 = submit_replay.main([
                "--changelog", log2, "--table", table_dir,
                "--slices", "1", "--mode", "cow", "--bloom-fast-path",
            ])
        finally:
            LakeTable.read = orig
        assert out2["events_applied"] == 50
        assert calls == [], "all-new-keys segment must read zero base data"
        assert t.read(spark).count() == before + 50


class TestChunkWhitespaceNormalization:
    """ADVICE low (textops.py): trim() strips only spaces, so tab/newline
    padding produced empty-string tokens (counted in n_tokens) and a
    tab-only doc emitted a phantom chunk."""

    def _chunks(self, spark, text):
        from embulk_input_marketo_spark.functions.textops import (
            chunk_documents,
        )

        df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
        return chunk_documents(df, size=4, overlap=0).collect()

    def test_tab_only_doc_yields_no_chunks(self, spark):
        assert self._chunks(spark, "\t") == []
        assert self._chunks(spark, " \n \t ") == []
        assert self._chunks(spark, "") == []
        assert self._chunks(spark, None) == []

    def test_padded_text_has_no_empty_tokens(self, spark):
        rows = self._chunks(spark, "\n\ta b c\t\n")
        assert len(rows) == 1
        assert rows[0].n_tokens == 3
        assert rows[0].chunk_text == "a b c"

    def test_interior_whitespace_runs_collapse_count(self, spark):
        # interior runs of whitespace must not create empty tokens either
        rows = self._chunks(spark, "a\t\tb\n\nc  d e")
        assert [r.n_tokens for r in rows] == [4, 1]
        assert rows[0].chunk_text.split() == ["a", "b", "c", "d"]
