"""Input-id sanitization & reconciliation (SURVEY.md §2.2 P10, §2.4).

Reference behavior (``MarketoBaseInputPluginDelegate.java:110-161``): split a
comma-separated id list, trim, drop empties, reject non-numeric ids (error if
none valid), then warn on ids the API doesn't know — re-expressed as
distributed filters plus a left-anti join for the missing-id report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMERIC_ID = r"^[0-9]+$"


def split_ids(df: DataFrame, col: str, out_col: str = "id") -> DataFrame:
    """Explode a comma-separated id-list column into trimmed non-empty ids
    (split + trim + drop blanks, ``CustomObjectInputPlugin.java:73-76``)."""
    return (
        df.select(F.explode(F.split(F.col(col), ",")).alias(out_col))
        .select(F.trim(F.col(out_col)).alias(out_col))
        .where(F.col(out_col) != "")
    )


def valid_ids(df: DataFrame, col: str = "id") -> DataFrame:
    """Keep numeric ids only (``:123`` — reject non-numeric)."""
    return df.where(F.col(col).rlike(NUMERIC_ID))


def missing_ids(requested: DataFrame, actual: DataFrame, col: str = "id") -> DataFrame:
    """Requested ids the system doesn't know — the reference's warn-on-missing
    loop (``:139-161``) as a left-anti join."""
    return requested.join(actual, on=col, how="left_anti")


def split_valid_invalid(
    df: DataFrame, error_col: str = "reasons"
) -> tuple[DataFrame, DataFrame]:
    """Row filter for invalid records (P8): drop records carrying an error
    node and keep them as a side output for logging/auditing — the
    reference's drop-and-warn (``CustomObjectInputPlugin.java:102-111``),
    with the rejects as a real DataFrame instead of log lines."""
    valid = df.where(F.col(error_col).isNull()).drop(error_col)
    rejects = df.where(F.col(error_col).isNotNull())
    return valid, rejects
