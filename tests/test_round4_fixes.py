"""Round-4 work: the round-3 VERDICT/ADVICE fixes and the round's new
surfaces.

ADVICE fixes under test here:
- FileSet.with_updates must carry untouched legacy-pending buckets forward
  (the first post-upgrade commit was silently dropping every untouched
  bucket's file list — data loss).
- changes() must fall back to a full-bucket scan unless BOTH snapshots are
  pointer-format.
- expire_snapshots must never delete an in-flight commit's staging dir, and
  must fold commits that land mid-scan into the live set.
- the program future-window guard must accept string and tz-aware bounds.

New surfaces: distributed orphan scan, near-dup connected components +
survivors, pack_documents_split, token_frequency_stats heavy-hitter split,
simhash numpy backend, CDF update pre-images, ANN index writer.
"""

import datetime
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_input_marketo_spark.dispatch import TargetConfig, dispatch
from embulk_input_marketo_spark.lake import LakeTable
from embulk_input_marketo_spark.lake.merge import merge_batch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                url=u,
                warc_ts=datetime.datetime(2024, 1, 1)
                + datetime.timedelta(seconds=ts),
                value=float(v),
                op=op,
                lsn=lsn,
            )
            for (u, ts, v, op, lsn) in rows
        ]
    )


def _legacyize(table: LakeTable, version: int | None = None) -> None:
    """Rewrite a committed manifest in the pre-round-3 legacy INLINE format
    (full per-bucket file lists in the snapshot JSON, no pointers) — the
    upgrade scenario the ADVICE data-loss bug lives in."""
    m = table.manifest(version)
    inline = {b: list(m.files[b]) for b in set(m.files)}
    d = {k: v for k, v in m.__dict__.items() if k != "files"}
    d["files"] = inline
    with open(table._manifest_path(m.version), "w") as f:
        f.write(json.dumps(d, indent=1, default=str))


class TestAdviceFixes:
    def test_legacy_manifest_merge_preserves_untouched_buckets(
        self, spark, tmp_path
    ):
        """Upgrade path: a legacy inline manifest loads with every bucket in
        `pending`. The first merge after upgrade touches ONE bucket — every
        other bucket's file list must survive into the new (pointer-format)
        manifest, not be silently dropped."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=16,
        )
        merge_batch(
            spark, table,
            _batch(spark, [(f"u{i}", i, i, "U", i) for i in range(64)]),
            batch_id="seed", lsn_col="lsn", checkpoint={"hwm_lsn": 63},
        )
        _legacyize(table)
        m_legacy = table.manifest()
        assert m_legacy.files.pending and not m_legacy.files.ptrs  # is legacy
        n_buckets_before = len(set(m_legacy.files))
        assert n_buckets_before > 4

        merge_batch(
            spark, table,
            _batch(spark, [("u0", 100, 1.0, "U", 100)]),
            batch_id="one", lsn_col="lsn", checkpoint={"hwm_lsn": 100},
        )
        m1 = table.manifest()
        # migrated: fully pointer-format, no bucket lost
        assert not m1.files.pending
        assert len(set(m1.files)) == n_buckets_before
        rows = {r["url"]: r["value"] for r in table.read(spark).collect()}
        assert len(rows) == 64
        assert rows["u0"] == 1.0 and rows["u5"] == 5.0

    def test_changes_with_legacy_from_snapshot(self, spark, tmp_path):
        """CDF across a legacy inline `from` snapshot: the pointer diff is
        unavailable on one side, so all buckets must scan — the feed still
        reports exactly the real changes (LWW drops unchanged keys)."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=8,
        )
        merge_batch(
            spark, table,
            _batch(spark, [(f"u{i}", i, i, "U", i) for i in range(20)]),
            batch_id="seed", lsn_col="lsn", checkpoint={"hwm_lsn": 19},
        )
        v1 = table.current_version()
        _legacyize(table, v1)
        merge_batch(
            spark, table,
            _batch(
                spark,
                [("u0", 100, 9.0, "U", 100), ("u7", 101, 0, "D", 101),
                 ("new1", 102, 1.0, "U", 102)],
            ),
            batch_id="b2", lsn_col="lsn", checkpoint={"hwm_lsn": 102},
        )
        v2 = table.current_version()
        feed = {
            r["url"]: r["_change"]
            for r in table.changes(spark, v1, v2).collect()
        }
        assert feed == {"u0": "update", "u7": "delete", "new1": "insert"}

    def test_expire_never_touches_inflight_staging(self, spark, tmp_path):
        """A commit in flight stages data under snap-<v> with v > the
        committed current version; expiry must not reclaim it even though no
        retained manifest references it yet."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=4,
        )
        for i in range(3):
            merge_batch(
                spark, table, _batch(spark, [("k", i, i, "U", i)]),
                batch_id=f"b{i}", lsn_col="lsn", checkpoint={"hwm_lsn": i},
            )
        staging = table.snapshot_staging_dir(table.current_version() + 1)
        part = os.path.join(staging, "_bucket=0")
        os.makedirs(part)
        inflight = os.path.join(part, "part-inflight.parquet")
        with open(inflight, "wb") as f:
            f.write(b"parquet-bytes-of-an-uncommitted-batch")

        removed = table.expire_snapshots(keep_last=1)
        assert removed["manifests"] >= 1
        assert os.path.exists(inflight), (
            "expiry deleted an in-flight commit's staged data"
        )
        # the committed table still reads
        assert table.read(spark).count() == 1

    def test_expire_distributed_matches_and_driver_stays_top_level(
        self, spark, tmp_path, monkeypatch
    ):
        """The spark-backed orphan scan reclaims the same garbage AND the
        driver's own listing work stays O(snapshots): it lists only the
        meta/data roots, never descending into per-snapshot part dirs (the
        walk + side-file reads run in executors)."""
        from embulk_input_marketo_spark.lake import fsio

        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=4,
        )
        for i in range(5):
            merge_batch(
                spark, table,
                _batch(spark, [(f"k{j}", i * 10 + j, i, "U", i * 10 + j)
                               for j in range(8)]),
                batch_id=f"b{i}", lsn_col="lsn", compact_threshold=2,
                checkpoint={"hwm_lsn": i * 10 + 7},
            )
        before = {r["url"]: r["value"] for r in table.read(spark).collect()}

        driver_listed: list[str] = []
        real_list_dir = fsio.list_dir

        def recording_list_dir(path):
            driver_listed.append(os.path.abspath(path))
            return real_list_dir(path)

        monkeypatch.setattr(fsio, "list_dir", recording_list_dir)
        removed = table.expire_snapshots(keep_last=2, spark=spark)
        monkeypatch.undo()

        assert removed["manifests"] >= 4  # merges + compactions, keep 2
        assert removed["data_files"] > 0
        allowed = {
            os.path.abspath(table.meta_dir), os.path.abspath(table.data_dir)
        }
        # driver-side fsio listing touched only the two roots — the
        # per-snapshot walk happened in executor processes (which re-import
        # fsio unpatched), so nothing deeper shows up here
        assert set(driver_listed) <= allowed, driver_listed
        after = {r["url"]: r["value"] for r in table.read(spark).collect()}
        assert after == before
        # time travel within the retained window still works
        assert table.read(
            spark, version=table.current_version() - 1
        ).count() == 8

    def test_program_future_window_accepts_string_and_aware_bounds(
        self, spark
    ):
        from embulk_input_marketo_spark import generator

        log = generator.changelog(spark, 500, 50, seed=5,
                                  duplicate_fraction=0.0)

        # ISO-string bounds in the far future → skip (empty), no TypeError
        cfg = TargetConfig(
            target="program", from_lsn=-1,
            extra={"earliest_updated_at": "2124-01-01T00:00:00",
                   "latest_updated_at": "2124-01-02T00:00:00"},
        )
        assert dispatch(spark, log, cfg).count() == 0

        # tz-aware bounds in the future → skip, no naive/aware TypeError
        aware = datetime.datetime(2124, 1, 1, tzinfo=datetime.timezone.utc)
        cfg = TargetConfig(
            target="program", from_lsn=-1,
            extra={"earliest_updated_at": aware,
                   "latest_updated_at": aware + datetime.timedelta(days=1)},
        )
        assert dispatch(spark, log, cfg).count() == 0

        # aware bounds with a NAIVE pinned now: awareness is normalized, and
        # a past window emits rows
        lo = datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc)
        hi = datetime.datetime(2100, 1, 1, tzinfo=datetime.timezone.utc)
        cfg = TargetConfig(
            target="program", from_lsn=-1,
            extra={"earliest_updated_at": lo, "latest_updated_at": hi,
                   "now": datetime.datetime(2101, 1, 1)},
        )
        assert dispatch(spark, log, cfg).count() > 0


def _uf_components(pairs):
    """Reference union-find on the driver — ground truth for the distributed
    large-star/small-star pass (test-only; this is exactly the thing the
    operator exists to avoid doing at scale)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestNearDupComponents:
    def test_chain_converges_to_one_component(self, spark):
        """A long path graph (a-b, b-c, ...) is the worst case for naive
        label propagation (diameter rounds); large-star/small-star must
        still collapse it to one min-labelled component within the round
        budget."""
        from embulk_input_marketo_spark.operators.dedup_docs import (
            near_dup_components,
        )

        n = 65
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "left_id long, right_id long"
        )
        out = near_dup_components(pairs).collect()
        assert len(out) == n
        assert {r["component_id"] for r in out} == {0}

    def test_random_graph_matches_union_find(self, spark):
        """Components of a seeded random graph (mix of cliques, chains and
        singletim edges) match a driver union-find exactly."""
        import random

        from embulk_input_marketo_spark.operators.dedup_docs import (
            near_dup_components,
        )

        rng = random.Random(1234)
        edges = set()
        for _ in range(300):
            a, b = rng.randrange(200), rng.randrange(200)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        # feed some edges reversed and duplicated: the operator must
        # canonicalize
        feed = [(a, b) for a, b in edges] + [
            (b, a) for a, b in list(edges)[::3]
        ]
        pairs = spark.createDataFrame(feed, "left_id long, right_id long")
        got = {
            r["doc_id"]: r["component_id"]
            for r in near_dup_components(pairs).collect()
        }
        assert got == _uf_components(edges)

    def test_survivor_policies(self, spark):
        """min-id policy keeps the component label; quality policy keeps the
        best-quality member (ties → min id); singletons always survive."""
        from embulk_input_marketo_spark.operators.dedup_docs import (
            near_dup_survivors,
        )

        docs = spark.createDataFrame(
            [(1, 0.1), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.2)],
            "doc_id long, quality double",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "left_id long, right_id long"
        )
        by_id = {
            r["doc_id"]: (r["component_id"], r["keep"])
            for r in near_dup_survivors(docs, pairs).collect()
        }
        assert by_id == {
            1: (1, True), 2: (1, False), 3: (1, False),
            4: (4, True), 9: (9, True),
        }
        by_q = {
            r["doc_id"]: (r["component_id"], r["keep"])
            for r in near_dup_survivors(
                docs, pairs, quality_col="quality"
            ).collect()
        }
        assert by_q == {
            1: (1, False), 2: (1, True), 3: (1, False),  # tie 2 vs 3 → min id
            4: (4, True), 9: (9, True),
        }
