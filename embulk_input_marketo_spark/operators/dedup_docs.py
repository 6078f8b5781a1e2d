"""Document-level deduplication family for training-data pipelines.

All-distributed designs over a `documents(doc_id, text, ...)` table:

- exact_dedup:     hash-groupBy on a content fingerprint — one shuffle.
- minhash_lsh:     shingle → K minhashes → band → bucket self-join. The
                   candidate join is on (band_id, band_hash), so only
                   same-bucket pairs shuffle — never the O(n²) cross join.
- simhash:         64-bit weighted-bit signature; simhash_hamming_pairs runs
                   the banded Hamming-distance search (exact recall for
                   hamming < bands, by pigeonhole over disjoint bit bands).
- ngram_jaccard:   exact Jaccard over n-gram sets for candidate pairs —
                   the verification stage after LSH candidate generation.

Everything uses native Spark expressions (explode / transform / aggregate /
xxhash64) — no Python in the hot path; determinism comes from seeded xxhash64.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves the stringified
from pyspark.sql import DataFrame  # type hints against module globals
from pyspark.sql import functions as F


def normalize_text(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def shingles_from_words(words, n: int = 5) -> F.Column:
    """Word n-gram (shingle) array from a words-array column, JVM-side:
    sliding windows via transform over an index sequence. Each window is n
    O(1) element_at lookups — NOT slice(words, i, n), which re-copies and
    makes the whole array O(words²) per row.

    IMPORTANT: pass an *attribute* (a materialized column), not an inline
    split(...) expression — the words expression is referenced n+2 times per
    window and interpreted evaluation (HOF lambdas are never codegen'd) has
    no common-subexpression elimination, so an inline expression would be
    recomputed for every reference."""
    words = F.col(words) if isinstance(words, str) else words
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.when(
        F.size(words) < n, F.array(F.concat_ws(" ", words))
    ).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + 1 + j).cast("int")) for j in range(n)]
            ),
        )
    )


def words_barrier(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """Project the normalized words array behind a materialization barrier
    so downstream shingle windows read a physical column (see
    shingles_from_words). Also spreads a few-file input across the session's
    parallelism — the shingle/hash work is CPU-bound per row.

    r6 ordering fix (guide §2.5 input skew): the repartition now happens on
    the RAW rows, BEFORE the normalize/split projection, with a lazy
    localCheckpoint above as the re-inlining barrier. The old shape
    (project → repartition) put the regex+split below the exchange — i.e.
    in the SCAN stage, and the bench fixtures are one-file single-row-group
    parquet, so the whole corpus normalization ran in ONE task regardless
    of cluster size. Raw text also shuffles smaller than the words
    arrays."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(*keep, F.col(text_col))
        .repartition(n_parts)
        .select(
            *keep, F.split(normalize_text(text_col), " ").alias("_words")
        )
        .localCheckpoint(eager=False)
    )


def shingles(col, n: int = 5) -> F.Column:
    """Convenience inline form (single-reference contexts only — see
    shingles_from_words for why hot paths must materialize words first)."""
    return shingles_from_words(F.split(normalize_text(col), " "), n)


def boilerplate_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level duplicated-passage detector (the CCNet/RefinedWeb-style
    boilerplate removal primitive): per document, how many of its DISTINCT
    word shingles appear in ≥ ``min_docs`` distinct documents corpus-wide —
    headers, footers, license blurbs and injected templates light up here.

    Output: (doc_id, n_shingles, n_boilerplate, boilerplate_frac). A removal
    pass is this plus a filter on the flagged shingles.

    Scale shape: every shuffle key is an 8-byte xxhash64 of the shingle (the
    strings never move after the map side); doc-frequency is one map-side-
    combined count; the flag join is co-partitioned with that count's
    exchange. Nothing is O(corpus²)."""
    from pyspark.sql.window import Window as W

    pairs = (
        words_barrier(df, text_col, keep=[id_col])
        .select(
            id_col,
            F.explode(
                shingles_from_words(F.col("_words"), shingle_n)
            ).alias("_g"),
        )
        .select(id_col, F.xxhash64("_g").alias("_h"))
        .distinct()
    )
    # r6 (guide §2.4): the doc-frequency used to be a groupBy(_h) + join
    # back onto the pair set — re-shuffling the pairs by _h a second time.
    # A count-over-window partitioned by _h on the distinct pair set is the
    # same number (rows are distinct (doc, hash), so the partition size IS
    # the hash's doc frequency) with one exchange instead of two + no join.
    dfreq = F.count(F.lit(1)).over(W.partitionBy("_h"))
    return (
        pairs.withColumn("_df", dfreq)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count_if(F.col("_df") >= min_docs).alias("n_boilerplate"),
        )
        .withColumn(
            "boilerplate_frac",
            F.round(F.col("n_boilerplate") / F.col("n_shingles"), 6),
        )
    )


def remove_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level repeated-LINE removal — the APPLY side of boilerplate
    detection (the FineWeb/CCNet line-dedup stage: strip lines that appear
    in ≥ ``min_docs`` distinct documents — cookie banners, copyright
    footers, nav text — and keep everything else in original order).
    ``boilerplate_shingles`` above flags documents; this rewrites them.

    Output: (id_col, clean_text, n_lines, n_removed). Lines whose
    NORMALIZED form (trim/lower/collapse-ws) is shorter than ``min_chars``
    are never counted and never removed — blank/whitespace lines are
    document structure, not boilerplate, no matter how common.
    ``n_removed`` counts removed line INSTANCES (a doc carrying the same
    banner twice loses both).

    Scale shape (what shuffles at 100 TB):
    - line frequency: distinct (doc, 8-byte line-hash) pairs then a
      map-side-combined count — line STRINGS never leave their row.
    - removal decision: a left-semi join of skinny (doc, pos, hash) rows
      against the flagged hash set; the flagged side is the boilerplate
      catalogue (tiny in practice → AQE converts to broadcast; a line
      present in every doc is exactly AQE's skew-split case on the SMJ
      path).
    - reconstruction is ROW-LOCAL: per-doc removed positions (a scalar int
      array) join back onto the ORIGINAL table and an indexed
      filter-over-split rebuilds the text from the doc's own column —
      the corpus text crosses at most one doc_id exchange (none when the
      removals side broadcasts), never a per-line shuffle.
    """
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line")
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("_line"))), r"\s+", " ")
    eligible = (
        lines.select(id_col, "_pos", norm.alias("_norm"))
        .where(F.length("_norm") >= min_chars)
        .select(id_col, "_pos", F.xxhash64("_norm").alias("_h"))
    )
    dfreq = (
        eligible.select(id_col, "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    flagged = dfreq.where(F.col("_df") >= min_docs).select("_h")
    removed = (
        eligible.join(flagged, "_h", "left_semi")
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("_pos")).alias("_rm"),
            F.count(F.lit(1)).alias("_n_removed"),
        )
    )
    return df.join(removed, id_col, "left").select(
        id_col,
        F.when(F.col("_rm").isNull(), F.col(text_col))
        .otherwise(
            F.concat_ws(
                "\n",
                F.filter(
                    F.split(F.col(text_col), "\n"),
                    lambda x, i: ~F.array_contains(F.col("_rm"), i),
                ),
            )
        )
        .alias("clean_text"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
        F.coalesce(F.col("_n_removed"), F.lit(0)).cast("long").alias("n_removed"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-leakage (decontamination) check: per corpus document, how
    many of its DISTINCT word shingles also occur anywhere in the benchmark
    set — the n-gram-overlap test used to keep eval data out of training
    corpora.

    Output: (doc_id, n_shingles, n_contaminated, contamination_frac).

    Scale shape: benchmark shingles reduce to DISTINCT 8-byte hashes; with
    ``broadcast_benchmark`` (evals are small — default) the flag join is a
    broadcast hash join and the corpus never shuffles before its per-doc
    count; otherwise both sides shuffle on the 8-byte hash. Either way the
    strings never move past the map side."""
    def sh_pairs(df):
        return (
            words_barrier(df, text_col, keep=[id_col])
            .select(
                id_col,
                F.explode(
                    shingles_from_words(F.col("_words"), shingle_n)
                ).alias("_g"),
            )
            .select(id_col, F.xxhash64("_g").alias("_h"))
            .distinct()
        )

    bench = sh_pairs(benchmark).select("_h").distinct().withColumn(
        "_hit", F.lit(1)
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        sh_pairs(corpus)
        .join(bench, "_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.col("_hit")).alias("n_contaminated"),
        )
        .withColumn(
            "contamination_frac",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-content group.
    Single hash aggregate; fingerprint = xxhash64 of normalized text so the
    shuffle key is 8 bytes, not the document."""
    fp = F.xxhash64(normalize_text(text_col)).alias("_fp")
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("group_size"))
        .select(id_col, "group_size")
    )


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _minhash_np_udf(num_hashes: int, seed: int):
    """Arrow pandas UDF computing the K-min family over shingle hashes with
    a numpy reimplementation of Spark's XxHash64 — BIT-IDENTICAL to the
    expression form ``xxhash64(h: long, i: int)`` (Spark folds children:
    ``hashInt(i, hashLong(h, 42))``), asserted by
    ``test_minhash_numpy_equals_expressions``. All lanes are wrapping uint64
    numpy ops; one (K, n_shingles) matrix per row, min along shingles."""
    import numpy as np

    u64 = np.uint64

    def _rotl(x, r):
        return (x << u64(r)) | (x >> u64(64 - r))

    def _avalanche(h):
        h ^= h >> u64(33)
        h *= u64(_P2)
        h ^= h >> u64(29)
        h *= u64(_P3)
        h ^= h >> u64(32)
        return h

    def _hash_long(vals, s):
        # XXH64 of one 8-byte (long) input with seed s
        acc = vals * u64(_P2)
        acc = _rotl(acc, 31) * u64(_P1)
        h = u64(s + _P5 + 8) ^ acc
        h = _rotl(h, 27) * u64(_P1) + u64(_P4)
        return _avalanche(h)

    def _hash_int(i, seeds):
        # XXH64 of one 4-byte (int) input `i` with per-row seeds
        h = seeds + u64(_P5 + 4)
        h ^= u64((i & 0xFFFFFFFF) * _P1 & 0xFFFFFFFFFFFFFFFF)
        h = _rotl(h, 23) * u64(_P2) + u64(_P3)
        return _avalanche(h)

    idx = list(range(seed, seed + num_hashes))

    def f(sh: pd.Series) -> pd.Series:
        # batch-level vectorization: all rows' shingle hashes concatenate
        # into ONE lane array, each of the K family hashes is a single
        # vectorized pass, and the per-row minima come from ONE
        # minimum.reduceat over the row-offset segments — a per-row matrix
        # loop left Python call overhead dominating (measured slower than
        # the interpreted expressions at ~130 shingles/doc)
        np_err = np.seterr(over="ignore")
        try:
            rows = list(sh)
            valid = [i for i, r in enumerate(rows)
                     if r is not None and len(r) > 0]
            out: list = [None] * len(rows)
            if not valid:
                return pd.Series(out)
            lens = np.array([len(rows[i]) for i in valid], dtype=np.int64)
            all_h = np.concatenate(
                [np.asarray(rows[i], dtype=np.int64) for i in valid]
            ).view(np.uint64)
            offsets = np.zeros(len(valid), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            inner = _hash_long(all_h, 42)
            mins = np.empty((len(valid), num_hashes), dtype=np.int64)
            for j, i in enumerate(idx):
                # Spark's array_min compares SIGNED longs — min in the
                # int64 view, not the unsigned lanes
                hk = _hash_int(i, inner).view(np.int64)
                mins[:, j] = np.minimum.reduceat(hk, offsets)
            for k, i in enumerate(valid):
                out[i] = mins[k].tolist()
            return pd.Series(out)
        finally:
            np.seterr(**np_err)

    return F.pandas_udf(f, "array<long>")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 5,
    seed: int = 42,
    accel: str = "auto",
) -> DataFrame:
    """K minhash values per doc: min over shingles of xxhash64(shingle, i).

    Two bit-identical backends for the K-min family over the (JVM-hashed)
    shingle longs:

    - ``accel='expr'`` (default, ='auto'): one nested higher-order
      expression — transform over the hash-index sequence of array_min over
      the shingles — instead of K inlined projections: K separate
      array_min(transform(...)) expressions blow the whole-stage-codegen
      method size (Janino compile failure → interpreted fallback, ~10×
      slower). One pass, no explode, no shuffle.
    - ``accel='np'``: an Arrow pandas UDF with a batch-vectorized numpy
      XxHash64 (one lane array for the whole batch, per-row minima via
      minimum.reduceat). Measured best-of-5 at sf0.1 (~130 words/doc):
      2.26 s vs 2.27 s for the expressions — a DEAD HEAT, because the
      JVM-side shingle string hashing dominates at this document length;
      the expression path stays default (no Arrow hop). The np path is the
      lever for long-document corpora where the K×n_shingles family work
      actually dominates.

    Equality of the two backends is pinned by
    ``test_minhash_numpy_equals_expressions``; the banded-LSH plan on top is
    identical either way."""
    # hash each shingle string ONCE to a long; the K family members then
    # hash that 8-byte long (far cheaper than re-hashing the string K times)
    sh = F.transform(
        shingles_from_words(F.col("_words"), shingle_n), lambda s: F.xxhash64(s)
    ).alias("_sh")
    if accel == "auto":
        # r6 re-measure: dead heat at K=32 (expr keeps the no-Arrow-hop
        # default), but at K=64 the family work dominates and the numpy
        # backend wins (0.86 s vs 1.11 s per corpus pass at sf1.0) — the
        # same crossover simhash hit at 64 bits. Backends are bit-identical
        # (test_minhash_numpy_equals_expressions).
        accel = "np" if num_hashes >= 64 else "expr"
    if accel == "np":
        mins = _minhash_np_udf(num_hashes, seed)(F.col("_sh")).alias("minhash")
    else:
        mins = F.transform(
            F.sequence(F.lit(seed), F.lit(seed + num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(F.col("_sh"), lambda h: F.xxhash64(h, i))
            ),
        ).alias("minhash")
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # each repartition is a MATERIALIZATION BARRIER, not (only) load
    # balancing: CollapseProject would otherwise inline the previous stage's
    # expression into every lambda that references it — HOF lambdas get no
    # common-subexpression elimination, so words/shingles would be recomputed
    # per reference (observed ~30x slowdown end-to-end).
    return (
        words_barrier(df, text_col, keep=[id_col])
        .select(F.col(id_col), sh)
        .repartition(n_parts)
        .select(id_col, mins)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
    max_bucket_size: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    signature → `bands` bands of `num_hashes/bands` rows; docs sharing any
    band hash become a candidate pair. Pair generation is ONE pass: group by
    (band_id, band_hash), collect the (sorted) member ids, expand the pairs
    with array expressions — no self-join, so the expensive signature
    projection is computed exactly once and the only shuffle is the groupBy.

    Skew guard: buckets larger than ``max_bucket_size`` (boilerplate that
    would explode quadratically) are skipped — those groups are exact-dup
    territory, which ``exact_dedup`` handles at O(n). The drops are NOT
    silent: ``lsh_bucket_stats`` (same parameters) reports how many buckets
    and member rows the guard excluded — run it alongside in any pipeline
    where dropped mass matters.

    The signature projection is CPU-bound per row (HOFs are interpreted, not
    codegen'd), so the input is repartitioned to the session's parallelism
    first — a single small parquet file must not pin the work to 2 cores."""
    banded = _lsh_banded(
        df, text_col, id_col, num_hashes, bands, shingle_n, seed, partitions
    )
    groups = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("_ids"))
        .where(
            (F.size("_ids") > 1) & (F.size("_ids") <= max_bucket_size)
        )
    )
    # expand each bucket's id array into its ordered pairs: for element i,
    # pair it with every later element (ids sorted → left < right)
    pair_structs = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(F.col("_ids"), i + 2, F.size(F.col("_ids"))),
                lambda y: F.struct(x.alias("l"), y.alias("r")),
            ),
        )
    )
    return (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.l").alias("left_id"), F.col("p.r").alias("right_id"))
        .distinct()
    )


def _lsh_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    partitions: int | None,
) -> DataFrame:
    """(id, band_id, band_hash) rows: the shared banding stage of the LSH
    pipeline — minhash signatures sliced into ``bands`` bands, each band
    hashed to one long."""
    rows_per_band = num_hashes // bands
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    # signatures repartition internally (materialization barrier + balance);
    # one more barrier here so banding reads `minhash` as a physical column
    # instead of CollapseProject re-inlining the signature per band
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, seed
    ).repartition(n_parts)
    # band hash = hash of the band's slice of the signature, via one nested
    # transform (codegen-friendly, see minhash_signatures)
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band),
                    lambda h: h.cast("string"),
                ),
            )
        ),
    )
    return sig.select(
        id_col, F.posexplode(band_hashes).alias("band_id", "band_hash")
    )


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
    max_bucket_size: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Skew diagnostics for ``minhash_lsh_pairs``: per band, how many buckets
    exist, how many the ``max_bucket_size`` guard DROPS, and how many member
    rows those drops represent — so the guard's data loss is observable
    instead of silent. One row per band_id plus totals live in the caller's
    aggregation of choice."""
    banded = _lsh_banded(
        df, text_col, id_col, num_hashes, bands, shingle_n, seed, partitions
    )
    sizes = banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.count_if(F.col("sz") > max_bucket_size).alias("n_oversize_buckets"),
        F.sum(F.when(F.col("sz") > max_bucket_size, F.col("sz")).otherwise(0))
        .alias("rows_in_oversize"),
    )


def _simhash_np_udf():
    """Arrow pandas UDF computing the 64 per-bit sign sums over shingle
    hashes in numpy — BIT-IDENTICAL to the interpreted expression form
    (asserted by ``test_simhash_numpy_equals_expressions``). Batch-level
    vectorization exactly like ``_minhash_np_udf``: one lane array for the
    whole batch, per-row sums via ``add.reduceat`` over row-offset segments,
    64 vectorized passes (one per bit)."""
    import numpy as np

    def f(sh: pd.Series) -> pd.Series:
        np_err = np.seterr(over="ignore")
        try:
            rows = list(sh)
            valid = [i for i, r in enumerate(rows) if r is not None]
            out: list = [None] * len(rows)
            if not valid:
                return pd.Series(out)
            lens = np.array([len(rows[i]) for i in valid], dtype=np.int64)
            sigs = np.zeros(len(valid), dtype=np.uint64)
            nonempty = lens > 0
            if nonempty.any():
                all_h = np.concatenate(
                    [np.asarray(rows[i], dtype=np.int64)
                     for i in valid if len(rows[i]) > 0]
                ).view(np.uint64)
                ne_lens = lens[nonempty]
                offsets = np.zeros(len(ne_lens), dtype=np.int64)
                np.cumsum(ne_lens[:-1], out=offsets[1:])
                ne_sigs = np.zeros(len(ne_lens), dtype=np.uint64)
                for b in range(64):
                    # ±1 per hash for this bit, summed per row segment —
                    # identical to the expression aggregate's long math
                    contrib = (
                        ((all_h >> np.uint64(b)) & np.uint64(1))
                        .astype(np.int64) * 2 - 1
                    )
                    pos = np.add.reduceat(contrib, offsets) > 0
                    ne_sigs |= pos.astype(np.uint64) << np.uint64(b)
                sigs[nonempty] = ne_sigs
            signed = sigs.view(np.int64)
            for k, i in enumerate(valid):
                out[i] = int(signed[k])
            return pd.Series(out)
        finally:
            np.seterr(**np_err)

    return F.pandas_udf(f, "long")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            shingle_n: int = 2, seed: int = 7,
            accel: str = "auto") -> DataFrame:
    """64-bit SimHash per doc: sum of ±1 per bit over shingle hashes, sign →
    bit. The shingle hashes are materialized behind a shuffle barrier so the
    per-bit work reads a physical column instead of re-computing the shingle
    pipeline 64 times (CollapseProject + no CSE in HOF lambdas).

    Two bit-identical backends for the 64 per-bit sign sums (the same
    ``accel`` discipline as :func:`minhash_signatures`):

    - ``accel='expr'``: 64 interpreted aggregate lambdas — no Arrow hop,
      but HOFs never reach codegen, and unlike minhash the family work here
      (64 passes over every shingle hash) DOMINATES the JVM-side string
      hashing; this was the most expensive headline query in round 3.
    - ``accel='np'`` (default via 'auto'): one Arrow batch, 64 vectorized
      numpy passes with per-row ``add.reduceat``. Measured best-of-3 at
      sf0.1 (local[32], ~130 bigram shingles/doc): signatures stage 2.53 s
      (expr) vs 1.11 s (np) — ~2.3× — so unlike minhash (a measured dead
      heat, kept on expressions) the numpy path IS the default here;
      BENCH_r04's simhash_hamming_pairs entry carries the end-to-end
      effect."""
    hashes = F.transform(
        shingles_from_words(F.col("_words"), shingle_n),
        lambda s: F.xxhash64(s, F.lit(seed)),
    ).alias("_h")
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    hashed = (
        words_barrier(df, text_col, keep=[id_col])
        .select(F.col(id_col), hashes)
        .repartition(n_parts)
    )
    if accel == "auto":
        accel = "np"  # measured ~3x over interpreted expressions; see above
    if accel == "np":
        return hashed.select(
            F.col(id_col), _simhash_np_udf()(F.col("_h")).alias("simhash")
        )
    h = F.col("_h")
    # bit b of signature = 1 iff sum over hashes of sign(bit b) > 0
    bits = [
        (
            F.aggregate(
                h,
                F.lit(0).cast("long"),
                lambda acc, hh: acc
                + F.when(F.shiftright(hh, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0
        ).cast("long")
        for b in range(64)
    ]
    sig = bits[0]
    for i in range(1, 64):
        sig = sig + F.shiftleft(bits[i], i)
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    seed: int = 7,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
    accel: str = "auto",
) -> DataFrame:
    """Hamming-distance near-duplicate search over 64-bit SimHash signatures
    (the banded search round 1 left unimplemented).

    Pigeonhole guarantee: if hamming(a, b) ≤ max_hamming and max_hamming <
    bands, the ≤max_hamming differing bits can touch at most max_hamming of
    the ``bands`` disjoint 64/bands-bit bands, so a and b agree EXACTLY on at
    least one band → grouping by (band_id, band_value) has perfect recall for
    the distance bound (not probabilistic, unlike minhash LSH).

    Shape: group by band value (one shuffle of 8-byte keys), expand in-bucket
    pairs with array expressions carrying the signatures (no self-join), then
    verify exact hamming = bit_count(xor) — candidates never exceed bucket
    sizes, and the same ``max_bucket_size`` skew guard applies (oversize
    buckets are exact-dup territory; see minhash_lsh_pairs).

    Returns (left_id, right_id, hamming ≤ max_hamming), left < right.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming for the "
            f"pigeonhole recall guarantee (got bands={bands})"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    sigs = simhash(df, text_col, id_col, shingle_n, seed, accel=accel)
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(band_vals).alias("band_id", "band_val"),
    )
    groups = (
        banded.groupBy("band_id", "band_val")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s")))
            ).alias("_m")
        )
        .where((F.size("_m") > 1) & (F.size("_m") <= max_bucket_size))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("_m"),
            lambda x, i: F.transform(
                F.slice(F.col("_m"), i + 2, F.size(F.col("_m"))),
                lambda y: F.struct(
                    x["i"].alias("li"), y["i"].alias("ri"),
                    x["s"].alias("ls"), y["s"].alias("rs"),
                ),
            ),
        )
    )
    return (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.li").alias("left_id"),
            F.col("p.ri").alias("right_id"),
            F.bit_count(F.col("p.ls").bitwiseXOR(F.col("p.rs"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def near_dup_components(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    id_out: str = "doc_id",
    comp_out: str = "component_id",
    max_iterations: int = 25,
    driver_max_edges: int = 500_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair set — the stage that
    turns verified PAIRS (minhash_lsh_pairs / simhash_hamming_pairs /
    winnowing overlaps) into dedup GROUPS. Alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
    2014): O(log²) rounds, every round two key-partitioned aggregates + one
    co-partitioned join — NO driver-side union-find, no whole-graph
    collect, so a 100 TB corpus' pair graph stays distributed.

    - large-star: every node's strictly-larger neighbors re-attach to the
      minimum of its closed neighborhood.
    - small-star: every node and its ≤-neighbors re-attach to that minimum.

    Stars (everyone pointing at the component min) are the fixpoint;
    convergence is detected by an edge-set fingerprint (count + hash-sum)
    going stable. Each round localCheckpoints to truncate lineage — the
    standard iterative-algorithm discipline (on a cluster, checkpoint to the
    fault-tolerant store instead; the eager-materialization semantics are
    identical).

    Returns (``id_out``, ``comp_out``): one row per node appearing in
    ``pairs``; ``comp_out`` is the component's MINIMUM node id (stable,
    deterministic label).

    The analogue in the reference is its per-batch uid dedup discipline
    (``MarketoBaseBulkExtractInputPlugin.java:86-89``) — keyed dedup the
    engine carries as LWW; near-dup groups have no shared key, hence the
    graph pass."""
    e = (
        pairs.select(
            F.col(left_col).cast("long").alias("u"),
            F.col(right_col).cast("long").alias("v"),
        )
        .where(
            F.col("u").isNotNull() & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
    )

    def swap(df):
        return df.select(F.col("v").alias("u"), F.col("u").alias("v"))

    def large_star(df):
        # min over the closed neighborhood via an aggregate + co-partitioned
        # join-back (NOT collect_set: a hot node's neighbor list must never
        # materialize into one row)
        sym = df.union(swap(df))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least(F.col("_mn"), F.col("u")).alias("_m")
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(df):
        oriented = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = oriented.groupBy("u").agg(F.min("v").alias("_m"))
        return (
            oriented.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .union(mins.select(F.col("u"), F.col("_m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def fingerprint(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    cur = e.localCheckpoint(eager=True)
    # r6: derive nodes from the CHECKPOINTED edge set — deriving from `e`
    # re-ran the entire upstream pair pipeline a second time (plan audit:
    # the node scan repeated the LSH/semantic candidate stages, ~19 s of
    # the sf1.0 semantic_dedup bench; guide §1.2 "don't compute things
    # twice"). Contents are identical: the checkpoint is `e` materialized.
    nodes = (
        cur.select("u").union(cur.select(F.col("v").alias("u"))).distinct()
    )
    prev = fingerprint(cur)
    if 0 < prev[0] <= driver_max_edges:
        # Scale-adaptive fast path (guide §1.2 "the distributed algorithm"):
        # the star loop costs ~4 rounds × (2 aggregates + join + distinct +
        # checkpoint + fingerprint) of fixed per-job overhead — for an edge
        # set already known (from the fingerprint just computed) to be
        # broadcast-sized, a driver union-find produces the identical
        # min-id labeling in one collect + one createDataFrame. The mapping
        # this builds is the same size as the broadcast that the join-back
        # below ships anyway, so driver memory is not a new exposure; pair
        # sets above the bound (the 100 TB case) take the distributed
        # star loop unchanged.
        edges_pd = cur.toPandas()
        parent: dict[int, int] = {}

        def _find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for u_, v_ in zip(edges_pd["u"], edges_pd["v"]):
            u_, v_ = int(u_), int(v_)
            parent.setdefault(u_, u_)
            parent.setdefault(v_, v_)
            ru, rv = _find(u_), _find(v_)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        label: dict[int, int] = {}
        for n_ in parent:
            r = _find(n_)
            label[r] = min(label.get(r, n_), n_)
        spark = pairs.sparkSession
        mapping = spark.createDataFrame(
            [(n_, label[_find(n_)]) for n_ in sorted(parent)],
            schema=f"u long, {comp_out} long",
        )
        return nodes.join(mapping, "u", "left").select(
            F.col("u").alias(id_out),
            F.coalesce(F.col(comp_out), F.col("u")).alias(comp_out),
        )
    if prev[0] > 0:
        for _ in range(max_iterations):
            cur = small_star(large_star(cur)).localCheckpoint(eager=True)
            fp = fingerprint(cur)
            if fp == prev:
                break
            prev = fp
        else:
            raise RuntimeError(
                f"near_dup_components did not converge in {max_iterations} "
                "large-star/small-star rounds"
            )
    # at the star fixpoint every non-root edge points at the component min;
    # roots (no outgoing edge) label themselves
    mapping = cur.groupBy("u").agg(F.min("v").alias(comp_out))
    return nodes.join(mapping, "u", "left").select(
        F.col("u").alias(id_out),
        F.coalesce(F.col(comp_out), F.col("u")).alias(comp_out),
    )


def near_dup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Survivor pick over near-duplicate components: every document gets its
    ``component_id`` (its own id when it has no near-duplicates) and a
    ``keep`` flag — the complete last stage of a corpus dedup pipeline
    (pairs → components → one representative per group).

    Policy: min-id by default — free, because the component label IS the
    minimum member id, so no extra shuffle. With ``quality_col`` the
    highest-quality member survives instead (ties: min id) — one window over
    components, which are near-dup groups and therefore small; a
    pathological giant component is boilerplate, which the LSH skew guard
    already routes to exact_dedup."""
    comps = near_dup_components(pairs, left_col, right_col, id_out=id_col)
    base = docs.select(F.col(id_col).cast("long").alias(id_col),
                       *([quality_col] if quality_col else []))
    joined = base.join(comps, id_col, "left").withColumn(
        "component_id", F.coalesce("component_id", F.col(id_col))
    )
    if quality_col is None:
        return joined.select(
            id_col, "component_id",
            (F.col(id_col) == F.col("component_id")).alias("keep"),
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy("component_id").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .select(id_col, "component_id", (F.col("_rn") == 1).alias("keep"))
    )


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs. Docs join in
    twice (broadcast when small; at scale, sort-merge on the id)."""
    grams = words_barrier(docs, text_col, keep=[id_col]).select(
        F.col(id_col),
        F.array_distinct(shingles_from_words(F.col("_words"), n)).alias("_g"),
    )
    j = (
        pairs.join(grams.withColumnRenamed(id_col, "left_id")
                   .withColumnRenamed("_g", "_gl"), "left_id")
        .join(grams.withColumnRenamed(id_col, "right_id")
              .withColumnRenamed("_g", "_gr"), "right_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_gl", "_gr"))
            / F.size(F.array_union("_gl", "_gr")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", F.round("jaccard", 6).alias("jaccard"))
    )
    return j


def apply_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """The terminal stage of the dedup pipeline: materialize the
    DEDUPLICATED CORPUS — input documents minus every non-survivor of the
    verified near-duplicate pair set. :func:`near_dup_survivors` decides
    who lives; this applies the decision, returning the kept rows with
    their full payload columns (what actually ships to tokenization).

    Scale shape: the survivor frame is (id, keep) — 16 bytes a row — so the
    semi-join back is a plain key-partitioned join (broadcastable whenever
    the duplicate-touched id set is small, which AQE decides from runtime
    stats); the corpus payload (html/text) moves through exactly once and
    only for kept rows after the filter."""
    keep = near_dup_survivors(
        docs, pairs, id_col=id_col, quality_col=quality_col
    ).where(F.col("keep"))
    return docs.join(
        keep.select(F.col(id_col).cast("long").alias(id_col)), id_col, "semi"
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batches against a persisted signature index
# ---------------------------------------------------------------------------
#
# The CDC-meets-corpus-dedup operator: a crawl's nightly batch must dedup
# against the ALREADY-KEPT corpus without rescanning it. The corpus side
# lives as a persisted banded-minhash index — (band_id, band_hash, id) rows,
# 24 bytes each, partitioned by band_id — so a batch dedup touches the index
# (a few % of corpus bytes), never the corpus text. This is the signature
# analogue of the ANN index writer (functions/similarity.write_ann_index).
#
# Decision semantics are banded-LSH candidacy (share any band ⇒ duplicate),
# the production posture of web-scale dedup (Dolma/RefinedWeb run unverified
# LSH at these parameters); callers needing exact-Jaccard confirmation feed
# the pair output through ngram_jaccard as usual.


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
) -> None:
    """Materialize the corpus' banded-minhash index. Parameters ride in a
    sidecar so every later batch banding is computed IDENTICALLY — a
    parameter drift between index and batch silently finds nothing."""
    import json
    import os

    params = {
        "text_col": text_col,
        "id_col": id_col,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "seed": seed,
    }
    banded = _lsh_banded(
        df, text_col, id_col, num_hashes, bands, shingle_n, seed, None
    )
    os.makedirs(path, exist_ok=True)
    # r6 (guide §6 small files): cluster by band BEFORE the partitioned
    # write — every task otherwise emits a file into every band dir
    # (tasks × bands tiny files; measured 3.5 s of the 7 s
    # incremental_dedup bench entry was this write's file/commit
    # overhead). One exchange of (band, hash, id) scalars; file count
    # drops to one per non-empty (partition, band).
    banded.repartition(F.col("band_id")).write.mode("overwrite").partitionBy(
        "band_id"
    ).parquet(os.path.join(path, "base"))
    tmp = os.path.join(path, "_params.json.tmp")
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.rename(tmp, os.path.join(path, "_params.json"))


def _minhash_index_params(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_params.json")) as f:
        return json.load(f)


def _read_minhash_index(spark, path: str) -> DataFrame:
    import os

    dirs = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if d == "base" or d.startswith("delta-")
    ]
    # each generation dir is its own partitioned table root (base/band_id=N,
    # delta-x/band_id=N): load per root so partition discovery sees a
    # consistent layout, then union — band_id pruning still applies per scan
    out = None
    for d in dirs:
        df = spark.read.parquet(d)
        out = df if out is None else out.unionByName(df)
    return out


def append_minhash_index(df: DataFrame, path: str) -> None:
    """Fold a batch's KEPT docs into the index as a delta dir (the index
    grows O(new survivors); nothing is rewritten). Readers union base +
    deltas; compacting deltas back into base is a plain rewrite job."""
    import os
    import uuid

    p = _minhash_index_params(path)
    banded = _lsh_banded(
        df, p["text_col"], p["id_col"], p["num_hashes"], p["bands"],
        p["shingle_n"], p["seed"], None,
    )
    # same band-clustered write as write_minhash_index (guide §6)
    banded.repartition(F.col("band_id")).write.partitionBy("band_id").parquet(
        os.path.join(path, f"delta-{uuid.uuid4().hex[:8]}")
    )


def incremental_dedup(
    new_docs: DataFrame,
    index_path: str,
    update_index: bool = False,
) -> DataFrame:
    """Dedup a new batch against the persisted corpus index AND within
    itself, in one pass over the batch:

    - ``dup_of_corpus``: the doc shares a band hash with an indexed doc.
      One semi-join of the batch's banded rows against the index on
      (band_id, band_hash) — co-partitioned by the join key, index side
      never rescans the corpus text.
    - ``dup_in_batch``: bucket-representative rule — within each batch band
      bucket the minimum id survives, everyone else is a duplicate (the
      ordered-pair convention of minhash_lsh_pairs collapsed to its
      decision). First occurrence wins, deterministically.
    - ``keep`` = neither.

    ``update_index=True`` appends the kept docs' banded rows as an index
    delta, so tomorrow's batch dedups against today's survivors — the
    index is the dedup pipeline's own incremental state, maintained like
    the lake's rollups: O(change), never O(corpus).

    Returns one row per batch doc: (id, dup_of_corpus, dup_in_batch, keep).
    """
    spark = new_docs.sparkSession
    p = _minhash_index_params(index_path)
    id_col = p["id_col"]
    banded_new = _lsh_banded(
        new_docs, p["text_col"], id_col, p["num_hashes"], p["bands"],
        p["shingle_n"], p["seed"], None,
    ).localCheckpoint(eager=True)  # banding is expensive; it feeds 3 plans
    index = _read_minhash_index(spark, index_path).select(
        "band_id", "band_hash"
    )
    corpus_hits = (
        banded_new.join(index, ["band_id", "band_hash"], "semi")
        .select(id_col)
        .distinct()
        .withColumn("dup_of_corpus", F.lit(True))
    )
    bucket_min = banded_new.groupBy("band_id", "band_hash").agg(
        F.min(id_col).alias("_min_id"), F.count(F.lit(1)).alias("_n")
    )
    batch_hits = (
        banded_new.join(bucket_min, ["band_id", "band_hash"])
        .where((F.col("_n") > 1) & (F.col(id_col) > F.col("_min_id")))
        .select(id_col)
        .distinct()
        .withColumn("dup_in_batch", F.lit(True))
    )
    out = (
        new_docs.select(id_col)
        .join(corpus_hits, id_col, "left")
        .join(batch_hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_of_corpus", F.lit(False)).alias("dup_of_corpus"),
            F.coalesce("dup_in_batch", F.lit(False)).alias("dup_in_batch"),
        )
        .withColumn(
            "keep", ~F.col("dup_of_corpus") & ~F.col("dup_in_batch")
        )
    )
    if update_index:
        kept_ids = out.where("keep").select(id_col)
        kept = new_docs.join(kept_ids, id_col, "semi")
        # an all-duplicates batch keeps nothing: writing a zero-file delta
        # dir would poison later index reads (no schema to infer)
        if kept.limit(1).count() > 0:
            append_minhash_index(kept, index_path)
    return out
