"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full CDC replay of the events-derived changelog
               through the engine (salted LWW dedup → manifest-gated MERGE
               into the bucketed lake table) at sf0.001.
queries()    — one entry per implemented operator (SURVEY.md §2), over the
               driver parquet tables.
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from embulk_input_marketo_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
