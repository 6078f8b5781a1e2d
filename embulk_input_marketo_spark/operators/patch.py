"""Column-level patch merge — partial-image CDC upserts.

Wire formats that ship PARTIAL update images (Debezium's MongoDB connector
patch events, JDBC sources configured with ``column.include.list``, any
"null means unchanged" convention) cannot be folded by row-level LWW: the
latest row would overwrite columns the event never carried. The fold has to
happen PER COLUMN — each column independently keeps the latest non-null
write — while row liveness (insert/delete) stays a row-level question.

The reference's analogue is its row-level ``uid_column`` LWW discipline
(``MarketoBaseBulkExtractInputPlugin.java:86-89``); this operator is that
discipline applied at column granularity, which the reference never needed
because Marketo's bulk extracts always carry full rows.

Semantics (per key, with a total event order ``order_cols`` — business time
major, unique log-sequence-number tiebreak):

- ``last_del``   = the greatest order among delete events.
- liveness       = there exists an upsert AFTER ``last_del`` (a delete kills
  the row; a later upsert resurrects it from scratch).
- column value   = the value carried by the greatest-order upsert whose
  image includes the column (non-null) AND that lies after ``last_del``.
  Writes from a previous incarnation never leak through a delete.

Scale shape: ONE map-side-combined hash aggregate. Per key the shuffle
carries only scalars plus one ``(order, value)`` candidate struct per patch
column — never whole event rows — so the exchange width is bounded by the
schema, not the event count, and zipf-hot keys collapse map-side exactly
like ``lww_dedup``. The post-delete clamp is applied AFTER the aggregate
(``candidate.order > last_del``), which is what makes a single pass
sufficient: if the latest non-null write predates the delete, the correct
answer is NULL and the clamp produces it.

NULL-skipping is guaranteed by using ``max(CASE WHEN cond THEN struct END)``
(``max`` ignores NULLs in both Spark and ANSI SQL) rather than relying on
``max_by``'s engine-specific treatment of NULL ordering keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def patch_fold(
    df: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str],
    patch_cols: list[str] | None = None,
    op_col: str = "op",
    upsert_op: str = "U",
    delete_op: str = "D",
) -> DataFrame:
    """Fold a partial-image changelog into final state, column-wise LWW.

    Returns one row per LIVE key: the key columns, the order columns of the
    latest surviving upsert (the row's version), then each patch column's
    latest post-delete non-null value. Keys whose last event is a delete
    (or that only ever saw deletes) are absent.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if patch_cols is None:
        patch_cols = [
            c for c in df.columns
            if c not in key_cols and c not in order_cols and c != op_col
        ]

    op = F.col(op_col)
    order = F.struct(*[F.col(c) for c in order_cols])
    is_up = op == F.lit(upsert_op)
    is_del = op == F.lit(delete_op)

    aggs = [
        F.max(F.when(is_del, order)).alias("_last_del"),
        F.max(F.when(is_up, order)).alias("_last_up"),
    ]
    for c in patch_cols:
        aggs.append(
            F.max(
                F.when(is_up & F.col(c).isNotNull(), F.struct(order.alias("o"), F.col(c).alias("v")))
            ).alias(f"_cand_{c}")
        )
    agg = df.groupBy(*key_cols).agg(*aggs)

    # live iff the latest upsert outlives the latest delete (struct
    # comparison against NULL yields NULL → coalesce to "no delete")
    live = agg.where(
        F.col("_last_up").isNotNull()
        & F.coalesce(F.col("_last_up") > F.col("_last_del"), F.lit(True))
    )

    cols = [F.col(c) for c in key_cols]
    cols += [F.col(f"_last_up.{c}").alias(c) for c in order_cols]
    for c in patch_cols:
        cand = F.col(f"_cand_{c}")
        cols.append(
            F.when(
                cand.isNotNull()
                & F.coalesce(cand["o"] > F.col("_last_del"), F.lit(True)),
                cand["v"],
            ).alias(c)
        )
    return live.select(*cols)
