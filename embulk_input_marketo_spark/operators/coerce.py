"""Late type coercion of stringly data — the reference's import-time parse
(``bulk_extract/AllStringJacksonServiceRecord.java:20-78``) as vectorized
column expressions.

Carried semantics:
- null rules: empty string → null and literal "null" → null
  (``CsvTokenizer.nextColumnOrNull:490-514``,
  ``AllStringJacksonServiceRecord.java:39-42``)
- the Marketo→engine type lattice (``model/MarketoField.java:73-116``):
  datetime/date → timestamp, integer/score → long,
  float/currency/percent → double, boolean → boolean, everything else →
  string; unknown type names default to string (``MarketoField.java:23-29``).
  (Note the reference's two mapping tables disagree on `percent`; we follow
  the one its dynamic mapper actually uses, MarketoField = DOUBLE.)
- timestamp formats: ``%Y-%m-%dT%H:%M:%S%z`` and ``%Y-%m-%d``
  (``MarketoUtils.java:43-44``)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marketo field-type → engine type (MarketoField.java:73-116)
MARKETO_TYPE_MAP = {
    "datetime": "timestamp",
    "date": "timestamp",
    "integer": "long",
    "score": "long",
    "float": "double",
    "currency": "double",
    "percent": "double",
    "boolean": "boolean",
    # email/formula/url/phone/textarea/text/string/reference → string
}

DATETIME_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"   # %Y-%m-%dT%H:%M:%S%z
DATETIME_FMT_Z = "yyyy-MM-dd'T'HH:mm:ss'Z'"
DATE_FMT = "yyyy-MM-dd"


def nullify(col: Column | str) -> Column:
    """'' → null, 'null' → null (reference null semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when((c == "") | (c == "null"), F.lit(None)).otherwise(c)


def coerce_column(col: Column | str, marketo_type: str) -> Column:
    """One all-string column → typed, with the reference's parse rules."""
    c = nullify(col)
    t = MARKETO_TYPE_MAP.get(marketo_type, "string")
    if t == "timestamp":
        if marketo_type == "date":
            return F.to_timestamp(c, DATE_FMT)
        # try offset form then literal-Z form (both appear in fixtures)
        return F.coalesce(
            F.try_to_timestamp(c, F.lit(DATETIME_FMT)),
            F.try_to_timestamp(c, F.lit(DATETIME_FMT_Z)),
        )
    if t == "boolean":
        # Boolean.parseBoolean: case-insensitive 'true' → true, else false
        return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.lower(c) == "true"
        )
    if t == "long":
        # Long.parseLong semantics (AllStringJacksonServiceRecord.java:50-55):
        # optionally-signed decimal digits ONLY — "12.5", "1e3", padded or
        # empty strings all throw NumberFormatException → null here. A bare
        # cast("long") would accept "12.5" → 12 (r4 VERDICT item 6); try_cast
        # additionally nulls out-of-range digit strings, parseLong's other
        # throw path.
        return F.when(c.rlike(r"^[+-]?[0-9]+$"), c.try_cast("long"))
    if t == "double":
        # Double.parseDouble throws → null on unparseable input (ANSI-safe)
        return c.try_cast(t)
    return c


def coerce(df: DataFrame, field_types: dict[str, str]) -> DataFrame:
    """All-string DataFrame → typed, per a {column: marketo_type} schema (the
    discovered-describe schema analogue). Columns not in the mapping stay
    string (unknown → STRING default)."""
    out = []
    for name in df.columns:
        mt = field_types.get(name, "string")
        out.append(coerce_column(name, mt).alias(name))
    return df.select(*out)
