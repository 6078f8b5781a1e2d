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
