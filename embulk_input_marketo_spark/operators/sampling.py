"""Deterministic stratified sampling — the data-mixing primitive of
training-corpus assembly (per-source / per-language target rates).

Inclusion is a PURE FUNCTION of (key, seed): a row is kept iff

    u(key, seed) / 2^32  <  rate(stratum),
    u = int(first 8 hex digits of md5(key || '|' || seed))

so sampling is reproducible across runs and engines (md5 is
engine-independent — the SQL oracle computes the identical draw), stable
under re-partitioning, and MONOTONE in the rate: raising a stratum's rate
only ADDS rows (the kept set at rate r is a subset of the kept set at
r' > r), which is what you want when iterating on mixture weights — no
churn of previously selected documents.

Scale shape: a single codegen'd filter over the scan — no shuffle, no
state; pushes down beneath joins like any deterministic predicate. At
10^10 rows md5-per-row is ~one digest of a short string; if that ever
dominates, swap the draw for xxhash64(key, seed)/2^64 (same properties,
JVM-cheaper) — kept md5 here so the DuckDB oracle can replicate the draw
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_draw(key_col: str, seed: int = 42) -> F.Column:
    """The uniform draw in [0, 1): first 8 md5 hex digits of 'key|seed'."""
    h = F.md5(
        F.concat_ws("|", F.col(key_col).cast("string"), F.lit(str(seed)))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(
        float(2**32)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep-rate in [0, 1]; strata not listed
    use ``default_rate``. NULL strata take the default."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.where(sample_draw(key_col, seed) < rate)
