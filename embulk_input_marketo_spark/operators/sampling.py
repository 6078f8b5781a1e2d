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


def pack_documents(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
    token_col: str | None = None,
) -> DataFrame:
    """Deterministic sequence packing (context-window assembly): documents
    fill bins of ``budget_tokens`` greedily in ``id_col`` order (per stratum
    when ``strata_col`` is given) — ``bin_id = floor(tokens_before / budget)``
    over a running token sum, so the assignment is a pure function of the
    input and reproducible on any engine. A document longer than the budget
    claims its bins alone (greedy fill does not split documents).

    Output: input key/stratum + (n_tokens, bin_id). ``token_col`` supplies
    precomputed token counts; otherwise the whitespace token counter runs
    inline (swap in a BPE count upstream for exact token budgets).

    Scale shape: one shuffle + sort per stratum (the sessionize-style
    window); a single giant stratum serializes into one task at extreme
    scale — the sessionize_split bucket-merge technique applies unchanged
    if packing order may be coarsened to time/id buckets."""
    from pyspark.sql.window import Window

    from embulk_input_marketo_spark.functions.textops import token_count

    n_tok = (
        F.col(token_col) if token_col else token_count(text_col)
    ).alias("n_tokens")
    part = [strata_col] if strata_col else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.col(id_col).asc())
    base = df.select(
        id_col, *([strata_col] if strata_col else []), n_tok
    )
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.withColumn(
        "bin_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(int(budget_tokens))),
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
