"""Training-shard assembly — the terminal sink of a corpus pipeline: the
cleaned/deduped/mixed document set materialized as N size-balanced shards
that a data loader streams independently.

Shard membership is a PURE FUNCTION of (id, seed) — the same md5 draw as
``operators/sampling`` (engine-independent, SQL-oracle-replayable):

    shard_id = floor(u(id, seed) * n_shards),  u in [0, 1)

so assignment is stable under re-partitioning and incremental re-runs
(adding documents never moves existing ones between shards), and uniform in
expectation — shard sizes concentrate tightly around corpus/n_shards (the
manifest records the actual spread; a skewed hash would show up there).

Scale shape: the writer is one codegen'd projection + a single shuffle on
``shard_id`` (repartition before write so each shard's files come from its
own tasks — no tiny-file spray from every task writing every shard), and
the manifest is one map-side-combined aggregate over the same scan. Nothing
driver-side grows with the corpus; the manifest is O(n_shards).

Reference parity note: the reference emits one flat record stream and
leaves sharding to the consumer (PageBuilder batches,
MarketoInputPluginDelegate.java); sharded training output is
beyond-reference surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_input_marketo_spark.functions.textops import token_count
from embulk_input_marketo_spark.operators.sampling import sample_draw

_MANIFEST = "_shards_manifest.json"


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Stamp each row with its deterministic ``shard_id`` (int in
    [0, n_shards)). Pure per-row expression — no shuffle, pushes down."""
    return df.withColumn(
        "shard_id",
        F.floor(sample_draw(id_col, seed) * F.lit(int(n_shards))).cast("int"),
    )


def shard_stats(
    df: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-shard (n_docs, n_tokens, content_hash) over the assigned corpus —
    the manifest body, and the verification probe. ``content_hash`` is the
    order-insensitive xxhash64 sum the lake's equivalence checker uses, so
    a re-read shard can be value-verified without re-sorting it."""
    return (
        assign_shards(df, n_shards, id_col=id_col, seed=seed)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).alias("n_tokens"),
            F.sum(
                F.xxhash64(F.col(id_col), F.col(text_col)).cast(
                    "decimal(38,0)"
                )
            )
            .cast("decimal(38,0)")
            .alias("content_hash"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> dict:
    """Materialize the corpus as ``path/shard_id=K/`` parquet plus a
    ``_shards_manifest.json`` sidecar recording the assignment parameters
    and per-shard stats. The manifest is written AFTER the data (a reader
    that finds the manifest knows the shards under it are complete — the
    same commit-ordering discipline as ``lake/table.py`` manifests).

    Returns the manifest dict."""
    assigned = assign_shards(df, n_shards, id_col=id_col, seed=seed)
    # one shuffle on shard_id: each shard's rows land in their own tasks,
    # so files-per-shard = tasks-per-shard, not total-tasks
    assigned.repartition(F.col("shard_id")).write.mode(
        "overwrite"
    ).partitionBy("shard_id").parquet(path)
    stats = {
        int(r["shard_id"]): {
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
            "content_hash": str(r["content_hash"]),
        }
        for r in shard_stats(
            df, n_shards, text_col=text_col, id_col=id_col, seed=seed
        ).collect()
    }
    manifest = {
        "n_shards": int(n_shards),
        "seed": int(seed),
        "id_col": id_col,
        "text_col": text_col,
        "shards": {str(k): stats[k] for k in sorted(stats)},
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession,
    path: str,
    shard_ids: list[int] | None = None,
) -> tuple[DataFrame, dict]:
    """Load shards + manifest. ``shard_ids`` prunes to those partitions at
    PLANNING time (partition-directory pruning — a loader rank reads its
    own shards, never the corpus)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(path)
    if shard_ids is not None:
        df = df.where(F.col("shard_id").isin([int(s) for s in shard_ids]))
    return df, manifest


def verify_shards(spark: SparkSession, path: str) -> DataFrame:
    """Recompute per-shard stats from the materialized files and compare
    with the manifest: returns (shard_id, ok, expected/actual columns) one
    row per manifest shard. Catches partial writes, lost files, and any
    drift between writer and reader environments."""
    df, manifest = read_training_shards(spark, path)
    actual = (
        df.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("a_docs"),
            F.sum(token_count(manifest["text_col"])).alias("a_tokens"),
            F.sum(
                F.xxhash64(
                    F.col(manifest["id_col"]), F.col(manifest["text_col"])
                ).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("a_hash"),
        )
    )
    expected = df.sparkSession.createDataFrame(
        [
            (int(k), v["n_docs"], v["n_tokens"], v["content_hash"])
            for k, v in manifest["shards"].items()
        ],
        "shard_id int, e_docs long, e_tokens long, e_hash string",
    )
    return (
        expected.join(actual, "shard_id", "full")
        .withColumn(
            "ok",
            (F.col("a_docs") == F.col("e_docs"))
            & (F.col("a_tokens") == F.col("e_tokens"))
            & (F.col("a_hash").cast("decimal(38,0)")
               == F.col("e_hash").cast("decimal(38,0)")),
        )
    )
