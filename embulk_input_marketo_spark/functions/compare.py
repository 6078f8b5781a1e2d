"""Distributed state-equivalence checking.

At 10^10 rows you cannot collect-and-diff; equivalence is checked as
(count, order-insensitive content hash) — a single aggregate per side:
``sum(xxhash64(struct(columns)))`` (wrap-around sum over per-row hashes).
Collisions are astronomically unlikely (64-bit per row), and the check is
one scan, no shuffle beyond the final reduce.

Also used by tests instead of ``exceptAll`` (and the per-url byte-identical
text comparator required by the input_hint invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """(row_count, order-insensitive content hash). Per-row xxhash64 summed
    as decimal(38,0): overflow-free up to ~10^19 rows, order-insensitive,
    exact (ANSI mode rejects wrap-around long sums)."""
    cols = cols or df.columns
    h = F.xxhash64(F.struct(*[F.col(c) for c in cols])).cast("decimal(38,0)")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def assert_same_state(a: DataFrame, b: DataFrame, cols: list[str] | None = None) -> None:
    cols = cols or sorted(set(a.columns) & set(b.columns))
    na, ha = content_hash(a.select(*cols), cols)
    nb, hb = content_hash(b.select(*cols), cols)
    assert na == nb, f"row counts differ: {na} != {nb}"
    assert ha == hb, f"content hash differs on {cols}: {ha} != {hb}"


def text_bytes_comparator(actual: DataFrame, expected: DataFrame,
                          key: str = "url", text_col: str = "text") -> DataFrame:
    """Per-key byte-identical text verification via Arrow-vectorized
    applyInPandas (input_hint §2.8): returns rows that MISMATCH (empty =
    pass). Grouped compare keeps each key's pair on one executor."""
    import pandas as pd

    a = actual.select(F.col(key), F.col(text_col).alias("_a"))
    e = expected.select(F.col(key), F.col(text_col).alias("_e"))
    joined = a.join(e, on=key, how="full_outer")

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        bad = pdf[
            ~(
                (pdf["_a"].isna() & pdf["_e"].isna())
                | (
                    pdf["_a"].notna()
                    & pdf["_e"].notna()
                    & (
                        pdf["_a"].map(lambda s: s.encode("utf-8") if isinstance(s, str) else s)
                        == pdf["_e"].map(lambda s: s.encode("utf-8") if isinstance(s, str) else s)
                    )
                )
            )
        ]
        return bad

    return joined.groupBy(key).applyInPandas(check, schema=joined.schema)
