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
    scale — and ``strata_col=None`` serializes the WHOLE corpus into one
    task. Use :func:`pack_documents_split` (bit-identical output, bounded
    task input) whenever a stratum may be large; this plain form is the
    readable spec and the small-input fast path."""
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


def pack_documents_split(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
    token_col: str | None = None,
    ids_per_bucket: int = 100_000,
) -> DataFrame:
    """Giant-stratum-safe sequence packing: identical ``bin_id`` assignment
    to :func:`pack_documents`, but no task ever holds a whole stratum (or,
    with ``strata_col=None``, the whole corpus).

    The decomposition is exact because ``bin_id`` is a pure function of the
    global exclusive prefix sum of token counts in ``id_col`` order, and
    prefix sums split perfectly — unlike sessionization there is no
    boundary-merge case at all (the sessionize_split technique,
    ``temporal.py``, minus its adjacency logic):

    1. bucket by ``floor(id / ids_per_bucket)`` — order-PRESERVING ranges of
       the numeric id (a hash bucket would scramble packing order);
    2. local exclusive prefix sums within each (stratum, bucket) window —
       hot strata spread across ~|ids|/ids_per_bucket tasks;
    3. per-bucket token totals → one per-stratum window over O(buckets)
       rows turns them into each bucket's carry-in offset;
    4. the offsets join back on (stratum, bucket) — a broadcast-sized side —
       and ``bin_id = floor((carry + local_before) / budget)``.
    """
    from pyspark.sql.window import Window

    from embulk_input_marketo_spark.functions.textops import token_count

    n_tok = (
        F.col(token_col) if token_col else token_count(text_col)
    ).alias("n_tokens")
    strata = [strata_col] if strata_col else []
    base = df.select(id_col, *strata, n_tok).withColumn(
        "_ib", F.floor(F.col(id_col) / F.lit(int(ids_per_bucket)))
    )
    wloc = Window.partitionBy(*(strata + ["_ib"])).orderBy(
        F.col(id_col).asc()
    )
    local = base.withColumn(
        "_lb",
        F.sum("n_tokens").over(
            wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("n_tokens"),
    )
    totals = base.groupBy(*(strata + ["_ib"])).agg(
        F.sum("n_tokens").alias("_tot")
    )
    wb = Window.partitionBy(
        *(strata if strata else [F.lit(1)])
    ).orderBy("_ib")
    carry = totals.withColumn(
        "_carry",
        F.coalesce(
            F.sum("_tot").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return (
        local.join(carry.select(*strata, "_ib", "_carry"),
                   on=strata + ["_ib"])
        .select(
            id_col,
            *strata,
            "n_tokens",
            F.floor(
                (F.col("_carry") + F.col("_lb"))
                / F.lit(int(budget_tokens))
            ).alias("bin_id"),
        )
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


def assign_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — every corpus row lands in
    exactly one named split, as a pure function of (key, seed).

    ``fractions`` maps split name → share, in BAND ORDER (dict order is the
    band layout: the first name owns draws in [0, f1), the second
    [f1, f1+f2), ...); shares must sum to 1 (±1e-9). The LAST band absorbs
    the float edge, so no row can fall between bands. Properties that make
    this the standard discipline:

    - reproducible across runs/engines (same md5 draw as every sampler
      here — the SQL oracle computes the identical band), and stable under
      repartitioning: membership never depends on row order or partitioning;
    - leak-safe growth: a NEW document joins a split independently; an
      existing document NEVER migrates (its draw is fixed), so later corpus
      additions cannot leak eval documents into train;
    - widening an EARLIER band only moves rows backward in band order
      (e.g. growing train shrinks val/test deterministically).

    Scale shape: one codegen'd CASE over the scan — no shuffle, no UDF, no
    state; pushes down like any deterministic projection. Split-balance per
    stratum follows from draw uniformity (law of large numbers) — for exact
    per-stratum counts use :func:`sample_k_per_stratum` instead.
    """
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = float(sum(fractions.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative")
    draw = sample_draw(key_col, seed)
    names = list(fractions)
    expr = F.lit(names[-1])  # last band absorbs the float edge
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += float(fractions[name])
        conds.append((name, cum))
    for name, hi in reversed(conds):
        expr = F.when(draw < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def sample_draw_long(key_col: str, seed: int = 42) -> F.Column:
    """The draw as its raw 32-bit integer (the numerator of
    :func:`sample_draw`) — rank comparisons use this, not the divided
    double, so Spark and the SQL oracle order by the IDENTICAL integer."""
    h = F.md5(
        F.concat_ws("|", F.col(key_col).cast("string"), F.lit(str(seed)))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def sample_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 64,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically —
    the fixed-COUNT face of corpus mixing (:func:`stratified_sample` is the
    fixed-RATE face): "exactly 10k eval docs per language", reproducible
    across runs, engines and repartitioning.

    Selection = the ``k`` smallest (md5 draw, key) pairs per stratum, the
    same pure (key, seed) draw as every sampler here, compared as the raw
    32-bit integer (``sample_draw_long``) so the SQL oracle orders by the
    identical value; ``key_col`` breaks the (astronomically rare) equal-draw
    tie. Monotone in ``k``: raising it only ADDS rows.

    Scale shape — bounded top-k, never a whole-stratum sort: a plain
    ``row_number`` over ``partitionBy(stratum)`` drags a 10^9-row stratum
    through ONE task (the pack_documents failure mode). Instead the
    hot-key-safe two-stage split (the sessionize_split discipline applied
    to top-k):

    1. salt into ``n_buckets`` by ``xxhash64(key)``; rank per
       (stratum, bucket) and keep rank ≤ k — exact, because any row in a
       stratum's global top-k is in its own bucket's top-k;
    2. re-rank the ≤ ``k·n_buckets`` survivors per stratum and keep
       rank ≤ k — the second window's partitions are candidate-sized,
       never corpus-sized.

    Output: ``(strata_col, key_col, sample_rank)``, rank in [1, k].
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    draw = sample_draw_long(key_col, seed)
    base = df.select(
        strata_col, key_col, draw.alias("_draw"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).alias("_sb"),
    )
    order = [F.col("_draw").asc(), F.col(key_col).asc()]
    local = Window.partitionBy(strata_col, "_sb").orderBy(*order)
    cand = base.withColumn("_lr", F.row_number().over(local)).where(
        F.col("_lr") <= k
    )
    final = Window.partitionBy(strata_col).orderBy(*order)
    return (
        cand.withColumn("sample_rank", F.row_number().over(final))
        .where(F.col("sample_rank") <= k)
        .select(strata_col, key_col, F.col("sample_rank").cast("long").alias("sample_rank"))
    )


def corpus_mix(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Token-budget mixture sampling — the corpus-mixing step of training-
    data assembly: given target mixture ``weights`` per source and a total
    ``budget_tokens``, keep each source's documents at the rate that lands
    its expected token contribution on ``weight/Σweights · budget``
    (clamped at 1.0 when a source is too small to fill its share — the
    under-supplied-source case is surfaced, not silently re-normalized).

    The per-document draw is the same pure (key, seed) md5 draw as
    :func:`stratified_sample`, so the selected set is reproducible,
    engine-independent, and monotone in the budget: raising the budget only
    adds documents.

    Scale shape: one map-side-combined aggregate produces the per-source
    token totals (|sources| rows), which join back BROADCAST; the corpus
    itself never shuffles — the final keep decision is a codegen'd filter
    over the scan. Sources not in ``weights`` get rate 0 (dropped).
    """
    from pyspark.sql.functions import broadcast

    from embulk_input_marketo_spark.functions.textops import token_count

    n_tok = (
        F.col(token_col) if token_col else token_count(text_col)
    ).alias("n_tokens")
    base = df.select(key_col, source_col, n_tok)
    totals = base.groupBy(source_col).agg(F.sum("n_tokens").alias("_tot"))
    wsum = float(sum(weights.values()))
    target = F.lit(0.0)
    for s, w in sorted(weights.items()):
        target = F.when(
            F.col(source_col) == s,
            F.lit(float(w) / wsum * float(budget_tokens)),
        ).otherwise(target)
    rate = F.least(F.lit(1.0), target / F.col("_tot").cast("double"))
    return (
        base.join(broadcast(totals), on=source_col)
        .where(sample_draw(key_col, seed) < rate)
        .select(key_col, source_col, "n_tokens", F.round(rate, 6).alias("rate"))
    )
