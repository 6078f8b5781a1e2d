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
        # the reference's quoted-value guard caps a single quoted value at
        # 128 KB (CsvTokenizer.java MAX_QUOTED_SIZE) — pin the same bound so
        # a run-away unterminated quote fails the same way instead of
        # buffering a whole file into one cell
        .option("maxCharsPerColumn", 131072)
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
    header: bool | None = None,
) -> DataFrame:
    """The reference's ACCEPT stray-quote mode as a distributed fallback
    parser: fields split on the delimiter (the mode's stated assumption: no
    delimiters inside fields), stray quotes preserved as data. Input a file
    or directory of line-oriented CSV; output all-string columns (late
    coercion applies downstream, P4).

    ``header`` is explicit (round-2 ADVICE): when True, Spark's csv reader
    skips exactly the FIRST LINE OF EACH FILE (offset-based — a data line
    byte-identical to the header survives, and files with headers work even
    when ``columns`` is supplied); when False nothing is skipped. Default:
    True iff ``columns`` is not given (the legacy inference).

    Physical shape: Spark's csv scan with quote processing DISABLED (tokens
    keep their quotes), then the ACCEPT unwrap/stray/null semantics as pure
    JVM expressions — fully codegen'd, no Python in the path at all (the
    previous mapInPandas parser is gone). Rows pad (null) / truncate to the
    column count, empty and comment lines skip, multi-line quoted values are
    out of scope — the mode's no-delimiters assumption extends to no
    embedded newlines (the reference tokenizer in ACCEPT mode likewise never
    enters a spanning-quote state; ``CsvTokenizer.java:764-780``)."""
    from pyspark.sql import functions as F

    if header is None:
        header = columns is None
    if columns is None:
        if not header:
            raise ValueError("columns are required when header=False")
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
    schema = StructType([StructField(c, StringType()) for c in columns])

    raw = (
        spark.read.schema(schema)
        .option("header", header)        # per-file first-line skip, by offset
        .option("delimiter", delimiter)
        .option("quote", "")             # disable quoting: tokens keep quotes
        .option("encoding", encoding)
        .option("comment", comment or "")
        .option("nullValue", "")         # unquoted empty → NULL (ACCEPT rule)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("mode", "PERMISSIVE")    # short rows pad, long rows truncate
        .csv(path)
    )

    def accept(col):
        wrapped = (
            (F.length(col) >= 2) & col.startswith(quote) & col.endswith(quote)
        )
        unwrapped = F.replace(
            col.substr(F.lit(2), F.length(col) - 2),
            F.lit(quote * 2),
            F.lit(quote),
        )
        v = F.when(wrapped, unwrapped).otherwise(col)
        return F.when(v == null_string, F.lit(None)).otherwise(v)

    return raw.select(*[accept(F.col(c)).alias(c) for c in columns])
