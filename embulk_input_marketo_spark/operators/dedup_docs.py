"""Document-level deduplication family for training-data pipelines.

All-distributed designs over a `documents(doc_id, text, ...)` table:

- exact_dedup:     hash-groupBy on a content fingerprint — one shuffle.
- minhash_lsh:     shingle → K minhashes → band → bucket self-join. The
                   candidate join is on (band_id, band_hash), so only
                   same-bucket pairs shuffle — never the O(n²) cross join.
- simhash:         64-bit weighted-bit signature; near-dups = same signature
                   (or banded prefixes for Hamming-distance search).
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


def shingles(col, n: int = 5) -> F.Column:
    """Word n-gram (shingle) array from normalized text, JVM-side: split →
    sliding windows via transform over an index sequence."""
    words = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.when(
        F.size(words) < n, F.array(F.concat_ws(" ", words))
    ).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
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


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 5,
    seed: int = 42,
) -> DataFrame:
    """K minhash values per doc: min over shingles of xxhash64(shingle, i).
    Computed as array expressions — one pass, no explode, no shuffle."""
    sh = shingles(text_col, shingle_n).alias("_sh")
    mins = F.array(
        *[
            F.array_min(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s, F.lit(seed + i)))
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    ).alias("minhash")
    return df.select(F.col(id_col), sh).select(id_col, mins)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    signature → `bands` bands of `num_hashes/bands` rows; docs sharing any
    band hash become a candidate pair. The self-join runs on
    (band_id, band_hash) so the shuffle is bucket-local; hot buckets (boiler-
    plate text) are handled by AQE skew-join at scale."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.get(F.col("minhash"), b * rows_per_band + r).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
        )
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            shingle_n: int = 2, seed: int = 7) -> DataFrame:
    """64-bit SimHash per doc: sum of ±1 per bit over shingle hashes, sign →
    bit. Pure array expressions (aggregate over bit positions)."""
    sh = shingles(text_col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed)))
    # bit b of signature = 1 iff sum over hashes of sign(bit b) > 0
    bits = [
        (
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0
        ).cast("long")
        for b in range(64)
    ]
    sig = bits[0]
    for i in range(1, 64):
        sig = sig + F.shiftleft(bits[i], i)
    return df.select(F.col(id_col), sig.alias("simhash"))


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
    grams = docs.select(
        F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("_g")
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
