"""Similarity search over embedding columns (`array<float>`).

- brute-force cosine top-k: `F.zip_with` dot product + window top-k — exact
  baseline, O(n·q) but fully distributed and codegen'd.
- LSH-bucketed ANN (random hyperplane signatures): candidates share a
  signature bucket → the scan is |bucket| not |table|; the scale path.

Deterministic hyperplanes come from xxhash64-seeded pseudo-randoms, so runs
are reproducible without numpy state on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast (small side); the
    embedding table never shuffles until the per-query top-k reduce."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    scored = embeddings.crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash chain (values in
    [-1, 1]); identical on every executor with no RNG state."""
    import hashlib

    out = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.sha256(f"{seed}|{plane}|{d}".encode()).digest()[:8], "big"
        )
        out.append((h / float(2**63)) - 1.0)
    return out


def lsh_signature(vec_col, dim: int, n_planes: int = 16, seed: int = 42) -> F.Column:
    """Random-hyperplane LSH: bit i = sign(v · p_i); returns a long bucket id."""
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, i, seed)])
        bit = (_dot(vec_col, plane) > 0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return sig


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: join on LSH bucket, exact cosine within the bucket.
    At 100 TB the bucketed table is written partitioned by signature so a
    query touches one partition (here: a hash-join on the signature)."""
    sig = lsh_signature(F.col(vec_col), dim, n_planes, seed)
    emb_b = embeddings.withColumn("_sig", sig)
    q_b = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
        ).withColumn("_sig", lsh_signature(F.col("_qvec"), dim, n_planes, seed))
    )
    scored = emb_b.join(q_b, "_sig").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )
