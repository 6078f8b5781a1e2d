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

from pyspark.sql import DataFrame
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
    """Project the normalized words array behind a shuffle barrier so
    downstream shingle windows read a physical column (see
    shingles_from_words). Also spreads a few-file input across the session's
    parallelism — the shingle/hash work is CPU-bound per row."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.select(
        *keep, F.split(normalize_text(text_col), " ").alias("_words")
    ).repartition(n_parts)


def shingles(col, n: int = 5) -> F.Column:
    """Convenience inline form (single-reference contexts only — see
    shingles_from_words for why hot paths must materialize words first)."""
    return shingles_from_words(F.split(normalize_text(col), " "), n)


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


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 5,
    seed: int = 42,
) -> DataFrame:
    """K minhash values per doc: min over shingles of xxhash64(shingle, i).

    One nested higher-order expression — transform over the hash-index
    sequence of array_min over the shingles — instead of K inlined
    projections: K separate array_min(transform(...)) expressions blow the
    whole-stage-codegen method size (Janino compile failure → interpreted
    fallback, ~10× slower). One pass, no explode, no shuffle."""
    # hash each shingle string ONCE to a long; the K family members then
    # hash that 8-byte long (far cheaper than re-hashing the string K times)
    sh = F.transform(
        shingles_from_words(F.col("_words"), shingle_n), lambda s: F.xxhash64(s)
    ).alias("_sh")
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


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            shingle_n: int = 2, seed: int = 7) -> DataFrame:
    """64-bit SimHash per doc: sum of ±1 per bit over shingle hashes, sign →
    bit. Pure array expressions (aggregate over bit positions). The shingle
    hashes are materialized behind a shuffle barrier so the 64 per-bit
    aggregates read a physical column instead of re-computing the shingle
    pipeline 64 times (CollapseProject + no CSE in HOF lambdas)."""
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
    sigs = simhash(df, text_col, id_col, shingle_n, seed)
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
