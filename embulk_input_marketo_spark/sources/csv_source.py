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
the ACCEPT mode's custom tokenization (quotes that don't wrap a whole field
stay literal) is ``accept_stray_quotes`` below — an Arrow-batched
mapInPandas parser over raw lines.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

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


def _accept_field(tok: str, quote: str, null_string: str) -> str | None:
    """One field under ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS
    (``CsvTokenizer.java:764-780``): a field fully wrapped in quotes is
    unwrapped (doubled quotes unescaped); any other quote is STRAY and kept
    literal instead of raising. ''/null_string → NULL like the main reader."""
    if len(tok) >= 2 and tok.startswith(quote) and tok.endswith(quote):
        v = tok[1:-1].replace(quote * 2, quote)
    else:
        v = tok
        if v == "":
            return None
    return None if v == null_string else v


def accept_stray_quotes(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    quote: str = '"',
    comment: str | None = None,
    encoding: str = "UTF-8",
    null_string: str = "null",
    columns: list[str] | None = None,
) -> DataFrame:
    """The reference's ACCEPT stray-quote mode as a distributed fallback
    parser: fields split on the delimiter (the mode's stated assumption: no
    delimiters inside fields), stray quotes preserved as data. Input a file
    or directory of line-oriented CSV; output all-string columns (late
    coercion applies downstream, P4). Arrow-batched ``mapInPandas`` over the
    line reader — no per-row Python UDF path, and the line scan distributes
    like any text scan.

    The header is read once driver-side (one line of one file, like the
    reference's single-stream header read); executors skip header-identical,
    empty and comment lines. Rows are padded/truncated to the header width.
    Multi-line quoted values are out of scope for this mode — the mode's
    no-delimiters assumption extends to no embedded newlines (the reference
    tokenizer in ACCEPT mode likewise never enters a spanning-quote state).
    """
    if columns is None:
        files = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            )
            if os.path.isdir(path)
            else [path]
        )
        with open(files[0], encoding=encoding) as f:
            header_line = f.readline().rstrip("\r\n")
        columns = [
            _accept_field(t, quote, null_string) or ""
            for t in header_line.split(delimiter)
        ]
    else:
        header_line = None
    schema = StructType([StructField(c, StringType()) for c in columns])
    n = len(columns)

    def parse(batches):
        for pdf in batches:
            data: list[list[str | None]] = []
            for line in pdf["value"]:
                if line is None or line == "" or line == header_line:
                    continue
                if comment and line.startswith(comment):
                    continue
                toks = line.split(delimiter)
                vals = [_accept_field(t, quote, null_string) for t in toks]
                vals = (vals + [None] * n)[:n]
                data.append(vals)
            yield pd.DataFrame(data, columns=columns, dtype=object)

    lines = spark.read.option("encoding", encoding).text(path)
    return lines.mapInPandas(parse, schema=schema)
