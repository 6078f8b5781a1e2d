"""Last-writer-wins dedup — the engine's core aggregate.

Carries the reference's ``uid_column`` dedup-key semantics
(``MarketoBaseBulkExtractInputPlugin.java:86-89``; Activity pins
``marketoGUID``, ``ActivityBulkExtractInputPlugin.java:35,54``) but makes it
*order-defining*: the winner per key is the row with max ``(warc_ts, lsn)``
(business time major, unique monotone log-sequence-number as tiebreak), so
late/out-of-order/duplicate delivery is absorbed deterministically.

Implementation notes for scale:
- ``max_by(struct(<payload>), struct(order_cols))`` — a hash aggregate with
  map-side partial aggregation, NOT ``dropDuplicates`` (nondeterministic) and
  NOT a window function (requires a full sort per key).
- Salted two-phase variant for zipf-hot keys: phase 1 aggregates
  ``(key, salt)`` — splitting a hot key across `salt_buckets` reducers —
  phase 2 reduces the ≤`salt_buckets` survivors per key. Associative +
  commutative because (warc_ts, lsn) is a total order per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str],
    salt_buckets: int | None = None,
    salt_on: str | None = None,
) -> DataFrame:
    """One row per key: the last writer by lexicographic ``order_cols``.

    salt_buckets: if set, two-phase salted aggregation (use for skewed keys).
    salt_on: column whose hash spreads the hot key (defaults to first
    order col, which is unique per event).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    payload = [c for c in df.columns if c not in key_cols]
    row = F.struct(*[F.col(c) for c in payload]).alias("_row")
    order = F.struct(*[F.col(c) for c in order_cols])

    if salt_buckets and salt_buckets > 1:
        salt_src = salt_on or order_cols[-1]
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets))
        )
        phase1 = salted.groupBy(*key_cols, "_salt").agg(
            F.max_by(row, order).alias("_row")
        )
        # re-expand order cols from the partial winner for the final reduce
        phase1 = phase1.select(
            *key_cols,
            F.col("_row"),
            *[F.col(f"_row.{c}").alias(c) for c in order_cols],
        )
        final = phase1.groupBy(*key_cols).agg(F.max_by(F.col("_row"), order).alias("_row"))
    else:
        final = df.groupBy(*key_cols).agg(F.max_by(row, order).alias("_row"))

    return final.select(*key_cols, *[F.col(f"_row.{c}").alias(c) for c in payload])
