"""Table mirroring: exactly-once replication of one lake table into another
over the change data feed.

The producer half is :meth:`LakeTable.changes` (the engine EMITTING CDC);
:class:`ChangeFeedFollower` consumes it into aggregates. This module is the
third leg: a downstream REPLICA table kept current by applying each pending
CDF slice as a channel-gated merge — the Delta/Iceberg "CDF-driven
replication" pattern (and the cloud-warehouse "table share/sync" shape).

Exactly-once without any side state: the mirror's read position IS the
replica's committed channel watermark (``channel_seq:<channel>`` in the
replica manifest's checkpoint), which moves atomically with the data in the
same manifest CAS. Crash anywhere → the watermark still names the last
fully-applied source version; the re-run recomputes the identical slice
(the feed is a pure function of two immutable snapshots) and the channel
gate no-ops redelivery. There is nothing to fsync, swap, or reconcile.

Ordering: a CDF slice is a NET snapshot diff — at most one change per key —
and slices apply in source-version order, so the replica batch carries
``_lsn = source_version`` as the LWW tiebreak. Source state only ever moves
forward in ``(lww_major, lsn)``, so replica ordering can never invert a
source transition.

Schema evolution: added source columns propagate automatically (the replica
gets a metadata-only ``add`` commit before the slice applies — pre-existing
replica rows read NULL, exactly like the source's own history). Renames and
drops are NOT auto-propagated: a replica may have its own consumers, so
destructive schema changes must be explicit; the mirror raises and names
the divergence instead of guessing.

Scale shape: per sync the work is O(change) — candidate buckets come from
the source's manifest pointer diff, the replica merge is one bucketed
append (MoR) — plus the one-time O(table) bootstrap. A 10^10-row replica
never re-reads its base after bootstrap.

Reference seam: the reference refreshes downstream copies by re-pulling
whole export windows (``MarketoBaseBulkExtractInputPlugin.java`` windowed
extract loops); this replaces that with change-proportional shipping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_input_marketo_spark.lake.merge import merge_batch
from embulk_input_marketo_spark.lake.table import LakeTable


@dataclass
class MirrorReport:
    """What one :func:`sync_mirror` call did."""

    bootstrapped: bool = False
    from_version: int = -1
    to_version: int = -1
    rows_applied: int = 0
    schema_added: list = field(default_factory=list)

    @property
    def applied(self) -> bool:
        return self.to_version > self.from_version


def mirror_position(dst: LakeTable, channel: str = "mirror") -> int:
    """The last source version fully applied to the replica (-1 = never)."""
    wm = dst.manifest().checkpoint.get(f"channel_seq:{channel}", -1)
    return -1 if wm is None else int(wm)


def create_mirror(
    src: LakeTable, path: str, n_buckets: int | None = None
) -> LakeTable:
    """An empty replica with the source's CURRENT schema and key/major
    contract. Bucket count may differ (replicas often serve a different
    read pattern); the merge re-buckets by the replica's own layout."""
    m = src.manifest()
    return LakeTable.create(
        path,
        m.current_schema(),
        key_col=m.key_col,
        lww_major=m.lww_major,
        n_buckets=n_buckets or m.n_buckets,
    )


def _reconcile_schema(src_m, dst: LakeTable) -> list:
    src_fields = {f.name: f for f in src_m.current_schema().fields}
    dst_schema = {
        f.name: f for f in dst.manifest().current_schema().fields
    }
    dst_fields = set(dst_schema)
    extra = dst_fields - set(src_fields)
    if extra:
        raise ValueError(
            f"replica {dst.path} has columns the source lacks "
            f"{sorted(extra)}: renames/drops do not auto-propagate — "
            "apply the matching evolve_schema to the replica explicitly"
        )
    # same-name TYPE divergence is just as destructive as a rename and must
    # not be papered over by the merge's cast-to-replica-schema: name the
    # divergence instead of silently narrowing/widening replica data
    mismatched = sorted(
        f"{n} (source {src_fields[n].dataType.simpleString()}, "
        f"replica {dst_schema[n].dataType.simpleString()})"
        for n in src_fields
        if n in dst_schema
        and src_fields[n].dataType != dst_schema[n].dataType
    )
    if mismatched:
        raise ValueError(
            f"replica {dst.path} column types diverge from the source: "
            f"{mismatched} — type changes do not auto-propagate; evolve "
            "the replica explicitly before syncing"
        )
    added = []
    changes = []
    for name, f in src_fields.items():
        if name not in dst_fields:
            changes.append(
                {"change": "add", "name": name,
                 "type": f.dataType.simpleString()}
            )
            added.append(name)
    if changes:
        dst.evolve_schema(
            changes, summary={"operation": "mirror_schema_sync"}
        )
    return added


def sync_mirror(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    channel: str = "mirror",
    compact_threshold: int = 8,
) -> MirrorReport:
    """Bring the replica up to the source's current version. Idempotent:
    re-running after any crash (or concurrently with a stale peer) applies
    nothing twice — the channel gate answers from the replica manifest."""
    pos = mirror_position(dst, channel)
    cur = src.current_version()
    rep = MirrorReport(from_version=pos, to_version=pos)
    if cur <= pos:
        return rep

    added = _reconcile_schema(src.manifest(), dst)
    rep.schema_added = added
    dst_cols = [f.name for f in dst.manifest().current_schema().fields]

    if pos < 0:
        # bootstrap: the source's current snapshot as one upsert batch
        # ("initial snapshot then changes", the streaming-CDF read shape)
        batch = (
            src.read(spark, version=cur)
            .select(*dst_cols)
            .withColumn("op", F.lit("U"))
            .withColumn("_lsn", F.lit(cur).cast("long"))
        )
        rep.bootstrapped = True
    else:
        feed = src.changes(spark, from_version=pos, to_version=cur)
        batch = feed.select(
            *dst_cols,
            F.when(F.col("_change") == "delete", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.lit(cur).cast("long").alias("_lsn"),
        )

    result = merge_batch(
        spark,
        dst,
        batch,
        batch_id=f"{channel}:{cur}",
        lsn_col="_lsn",
        channel=(channel, cur),
        compact_threshold=compact_threshold,
        lineage={"source": src.path, "src_version": cur, "channel": channel},
    )
    rep.rows_applied = result.rows_in
    rep.to_version = cur
    return rep


def mirror_lag(src: LakeTable, dst: LakeTable, channel: str = "mirror") -> int:
    """How many source versions the replica is behind (0 = caught up)."""
    return max(src.current_version() - mirror_position(dst, channel), 0)
