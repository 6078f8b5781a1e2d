"""Round-3 work: the VERDICT/ADVICE fixes and the round's new surfaces.

Fixes: manifest metadata deltas (commit metadata O(touched buckets), not
O(table)); window-scoped idempotence gate (checkpoint carries no gate
semantics); IVF centroids as broadcast data (plan O(1) in n_cells); CSV
header/quoted-value hardening; hot-key split-operator row identity.

New surfaces: snapshot expiry, point lookup, change data feed, stratified
sampling, sequence packing, boilerplate/contamination corpus operators,
numpy minhash backend, spark-submit entrypoint.
"""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    import datetime

    return spark.createDataFrame(
        [
            Row(
                url=u,
                warc_ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts),
                value=float(v),
                op=op,
                lsn=lsn,
            )
            for (u, ts, v, op, lsn) in rows
        ]
    )


def _snapshot_bytes(table: LakeTable, version: int) -> int:
    return os.path.getsize(table._manifest_path(version))


def _side_files_for_version(table: LakeTable, version: int) -> list[str]:
    pref = f"bucket-{version:012d}-"
    return [f for f in os.listdir(table.meta_dir) if f.startswith(pref)]


class TestRound3:
    def test_commit_metadata_stays_flat_as_table_grows(self, spark, tmp_path):
        """MoR appends accumulate file entries per bucket, but each commit's
        metadata write is O(touched buckets): side files only for touched
        buckets, snapshot JSON size flat (pointers, not file lists)."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=16,
        )
        sizes = []
        for i in range(6):
            # one key → one bucket touched per commit; growing hwm retires
            # the applied-batches entries (window gate answers them)
            merge_batch(
                spark, table,
                _batch(spark, [("k0", i, i, "U", i)]),
                batch_id=f"b{i}",
                lsn_col="lsn",
                compact_threshold=100,
                checkpoint={"hwm_lsn": i},
            )
            v = table.current_version()
            sizes.append(_snapshot_bytes(table, v))
            assert len(_side_files_for_version(table, v)) == 1, (
                "a single-bucket commit must write exactly one bucket side "
                "file, not relist the table"
            )

        m = table.manifest()
        bucket = next(iter(m.files))
        assert len(m.files[bucket]) == 6  # the data DID accumulate
        # manifest JSON size must not scale with accumulated file count
        assert sizes[-1] <= sizes[1] * 1.3, sizes

    def test_untouched_buckets_inherit_by_pointer(self, spark, tmp_path):
        table = LakeTable.create(
            str(tmp_path / "t2"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=16,
        )
        # seed many buckets
        merge_batch(
            spark, table,
            _batch(spark, [(f"u{i}", i, i, "U", i) for i in range(64)]),
            batch_id="seed", lsn_col="lsn", checkpoint={"hwm_lsn": 63},
        )
        m0 = table.manifest()
        seeded = set(m0.files)
        assert len(seeded) > 4
        # now touch one key: only its bucket's side file is rewritten
        merge_batch(
            spark, table,
            _batch(spark, [("u0", 100, 1.0, "U", 100)]),
            batch_id="one", lsn_col="lsn", checkpoint={"hwm_lsn": 100},
        )
        v = table.current_version()
        assert len(_side_files_for_version(table, v)) == 1
        m1 = table.manifest()
        # untouched buckets point at the seed commit's side files
        unchanged = [
            b for b in seeded if m1.files.ptrs[b] == m0.files.ptrs.get(b)
        ]
        assert len(unchanged) == len(seeded) - 1

        # and the data is intact: LWW winner for u0, everything else as seeded
        rows = {r["url"]: r["value"] for r in table.read(spark).collect()}
        assert rows["u0"] == 1.0 and rows["u5"] == 5.0 and len(rows) == 64

    def test_time_travel_across_delta_commits(self, spark, tmp_path):
        """Old snapshots stay readable: their side files are never deleted."""
        table = LakeTable.create(
            str(tmp_path / "t3"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=8,
        )
        merge_batch(
            spark, table, _batch(spark, [("a", 1, 1.0, "U", 1)]),
            batch_id="b1", lsn_col="lsn", checkpoint={"hwm_lsn": 1},
        )
        v1 = table.current_version()
        merge_batch(
            spark, table, _batch(spark, [("a", 2, 2.0, "U", 2)]),
            batch_id="b2", lsn_col="lsn", checkpoint={"hwm_lsn": 2},
        )
        old = table.read(spark, version=v1).collect()
        new = table.read(spark).collect()
        assert [r["value"] for r in old] == [1.0]
        assert [r["value"] for r in new] == [2.0]

    def test_ivf_plan_size_independent_of_n_cells(self, spark, sf_dir):
        """Centroids travel as broadcast data, not literal expressions: the
        physical plan for n_cells=256 must stay within ~2x of n_cells=8
        (the literal-inlining version grew O(n_cells*dim) — r2 ADVICE)."""
        from embulk_input_marketo_spark.functions import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        queries = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        plans = {}
        for n_cells in (8, 256):
            df = similarity.ivf_topk(
                emb, queries, dim=64, k=3, n_cells=n_cells, n_probe=2
            )
            plans[n_cells] = len(
                df._jdf.queryExecution().executedPlan().toString()
            )
        assert plans[256] < plans[8] * 2, plans

    def test_train_ivf_uses_take_ordered_not_global_sort(self, spark, sf_dir):
        """Sampling centroids is orderBy(hash).limit(n) — Spark plans that as
        TakeOrderedAndProject (per-partition top-n), never a full Sort+Exchange
        of the embedding table."""
        from embulk_input_marketo_spark.functions import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = similarity.train_ivf(emb, n_cells=16)
        plan = cents._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert cents.count() == 16

    def test_ivf_precomputed_centroids_roundtrip(self, spark, sf_dir):
        """train_ivf/assign_cells split: passing the trained centroid table
        explicitly reproduces the in-line training result (the maintenance-
        job retraining seam is a drop-in)."""
        from embulk_input_marketo_spark.functions import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        cents = similarity.train_ivf(emb, n_cells=8)
        a = sorted(
            (r.query_id, r.vec_id, r.rnk)
            for r in similarity.ivf_topk(
                emb, queries, dim=64, k=5, n_cells=8, n_probe=8
            ).collect()
        )
        b = sorted(
            (r.query_id, r.vec_id, r.rnk)
            for r in similarity.ivf_topk(
                emb, queries, dim=64, k=5, n_probe=8, centroids=cents
            ).collect()
        )
        assert a == b

    def test_csv_quoted_value_128kb_guard(self, spark, tmp_path):
        """The reference caps a quoted value at 128 KB (CsvTokenizer's
        quoted-value guard); the option mapping pins maxCharsPerColumn so an
        oversized value fails rather than buffering unboundedly."""
        from embulk_input_marketo_spark.sources.csv_source import (
            read_bulk_extract_csv,
        )

        ok = tmp_path / "ok.csv"
        ok.write_text('id,blob\n1,"' + "x" * 1000 + '"\n')
        assert read_bulk_extract_csv(spark, str(ok)).count() == 1

        big = tmp_path / "big.csv"
        big.write_text('id,blob\n1,"' + "x" * 200_000 + '"\n')
        with pytest.raises(Exception, match="(?i)maxCharsPerColumn|length"):
            read_bulk_extract_csv(spark, str(big)).collect()

    def test_stray_quotes_header_handling(self, spark, tmp_path):
        """Explicit header param (r2 ADVICE): offset-based per-file skip — a
        data line identical to the header survives; columns+header=True
        works; header=False with columns skips nothing."""
        from embulk_input_marketo_spark.sources.csv_source import (
            accept_stray_quotes,
        )

        p = tmp_path / "h.csv"
        p.write_text("id,name\n1,a\nid,name\n2,b\n")  # line 3 == header text

        rows = {r["id"]: r["name"]
                for r in accept_stray_quotes(spark, str(p)).collect()}
        # the header-identical DATA line is kept (old parser dropped it)
        assert rows == {"1": "a", "id": "name", "2": "b"}

        # columns supplied AND the file has a header: header=True skips it
        rows2 = {r["k"]: r["v"]
                 for r in accept_stray_quotes(
                     spark, str(p), columns=["k", "v"], header=True
                 ).collect()}
        assert rows2 == {"1": "a", "id": "name", "2": "b"}

        # headerless file with columns: nothing skipped
        p2 = tmp_path / "nh.csv"
        p2.write_text("1,a\n2,b\n")
        rows3 = {r["k"]: r["v"]
                 for r in accept_stray_quotes(
                     spark, str(p2), columns=["k", "v"]
                 ).collect()}
        assert rows3 == {"1": "a", "2": "b"}

    def test_split_operators_row_identical_on_hot_key(self, spark):
        """Design-point correctness: ONE key holds the entire frame (the
        plain operators' worst case — their per-key window is a single task).
        The split variants must be row-identical; the wall-time win at 10⁶
        events is recorded by bench.py's hotkey section."""
        from embulk_input_marketo_spark.functions.compare import content_hash
        from embulk_input_marketo_spark.operators.temporal import (
            asof_join, asof_join_split, sessionize, sessionize_split,
        )

        n = 100_000
        hot = spark.range(n).select(
            F.lit(0).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("id") * 7 + F.col("id") % 3
            ).alias("ts"),
            F.col("id").alias("event_id"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        quotes = spark.range(n // 20).select(
            F.lit(0).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("id") * 140
            ).alias("rts"),
            (F.col("id") % 31).cast("double").alias("price"),
        )

        cols = ["user_id", "ts", "event_id", "value", "session_seq"]
        plain = content_hash(
            sessionize(hot, "user_id", "ts", gap_sec=3600,
                       order_tiebreak="event_id").select(*cols), cols)
        split = content_hash(
            sessionize_split(hot, "user_id", "ts", gap_sec=3600,
                             split_every_sec=43200,
                             order_tiebreak="event_id").select(*cols), cols)
        assert plain == split and plain[0] == n

        acols = ["user_id", "ts", "event_id", "value", "price"]
        aplain = content_hash(
            asof_join(hot, quotes, on="user_id", left_ts="ts",
                      right_ts="rts", payload_cols=["price"]).select(*acols),
            acols)
        asplit = content_hash(
            asof_join_split(hot, quotes, on="user_id", left_ts="ts",
                            right_ts="rts", payload_cols=["price"],
                            split_every_sec=43200).select(*acols), acols)
        assert aplain == asplit and aplain[0] == n

    def test_boilerplate_detector_flags_planted_header(self, spark, sf_dir):
        """Corpus-level duplicated-passage detection: docs sharing the
        planted header shingle must be flagged; organic docs (shingles in
        <3 docs) must not."""
        from embulk_input_marketo_spark.plans.queries import QUERIES

        rows = {r["doc_id"]: r for r in
                QUERIES["boilerplate_passages"](spark, sf_dir).collect()}
        planted = [r for i, r in rows.items() if i % 10 == 0]
        assert planted and all(r["n_boilerplate"] > 0 for r in planted)
        assert any(
            r["n_boilerplate"] == 0 for i, r in rows.items() if i % 10 != 0
        )

    def test_doc_repetition_exact_values(self, spark):
        from embulk_input_marketo_spark.functions.textops import doc_repetition

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "x x x x")], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r for r in
               doc_repetition(df, "text", "doc_id").collect()}
        r1 = out[1]
        assert (r1["n_words"], r1["n_distinct_words"]) == (3, 2)
        assert (r1["top_bigram_n"], r1["n_bigrams"]) == (1, 2)
        assert r1["dup_word_frac"] == 0.333333 and r1["top_bigram_frac"] == 0.5
        r2 = out[2]
        # "x x" appears 3 times out of 3 bigrams: pure repetition
        assert r2["dup_word_frac"] == 0.75 and r2["top_bigram_frac"] == 1.0

    def test_minhash_numpy_equals_expressions(self, spark, sf_dir):
        """The numpy XxHash64 backend must be BIT-IDENTICAL to the
        expression backend — same signatures, same LSH bands, same oracle."""
        from embulk_input_marketo_spark.operators import dedup_docs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        a = {r["doc_id"]: list(r["minhash"]) for r in
             dedup_docs.minhash_signatures(docs, accel="expr").collect()}
        b = {r["doc_id"]: list(r["minhash"]) for r in
             dedup_docs.minhash_signatures(docs, accel="np").collect()}
        assert len(a) == 50 and a == b

    def test_spark_submit_entrypoint(self, spark, tmp_path):
        """The spark-submit surface: submit_replay.main() builds no session
        of its own (takes the active one, i.e. whatever --master spark-submit
        provided), creates the table, replays, resumes exactly-once."""
        import submit_replay
        from embulk_input_marketo_spark import generator

        log_dir = str(tmp_path / "log")
        generator.changelog(spark, 2_000, 200, seed=9).write.parquet(log_dir)
        table_dir = str(tmp_path / "t")
        out = submit_replay.main([
            "--changelog", log_dir, "--table", table_dir,
            "--create", "--slices", "2",
        ])
        assert out["events_applied"] == 2_000
        assert int(out["final_checkpoint"]["hwm_lsn"]) == 1_999
        # resume: nothing pending, state unchanged
        out2 = submit_replay.main(
            ["--changelog", log_dir, "--table", table_dir]
        )
        assert out2["events_applied"] == 0
        # without --create on a missing table: explicit error, no fabrication
        with pytest.raises(SystemExit, match="does not exist"):
            submit_replay.main(
                ["--changelog", log_dir, "--table", str(tmp_path / "nope")]
            )

    def test_expire_snapshots_reclaims_history_and_orphans(self, spark, tmp_path):
        """Iceberg-style expiry: old manifests + unreferenced side files +
        superseded data generations are physically reclaimed; the current
        snapshot (and every retained one) stays fully readable."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=4,
        )
        for i in range(6):
            merge_batch(
                spark, table, _batch(spark, [("k0", i, i, "U", i)]),
                batch_id=f"b{i}", lsn_col="lsn", compact_threshold=3,
                checkpoint={"hwm_lsn": i}, window=(i - 1, i),
            )
        cur = table.current_version()

        def count_parquet():
            n = 0
            for root, _, files in os.walk(table.data_dir):
                n += sum(1 for f in files if f.endswith(".parquet"))
            return n

        before_files = count_parquet()
        removed = table.expire_snapshots(keep_last=2)
        assert removed["manifests"] > 0
        assert removed["data_files"] > 0  # superseded generations reclaimed
        assert count_parquet() == before_files - removed["data_files"]

        # current state intact after reclaim
        rows = table.read(spark).collect()
        assert [(r["url"], r["value"]) for r in rows] == [("k0", 5.0)]
        # every retained version still readable; history skips expired
        vs = [m.version for m in table.history()]
        assert vs and min(vs) >= cur - 1 and cur in vs
        # idempotent re-run reclaims nothing more
        again = table.expire_snapshots(keep_last=2)
        assert again == {"manifests": 0, "side_files": 0, "data_files": 0}

    def test_stratified_sample_monotone_and_calibrated(self, spark, sf_dir):
        """The deterministic draw is monotone in the rate (raising a
        stratum's weight only ADDS documents — no churn while iterating on
        mixture weights) and roughly calibrated."""
        from embulk_input_marketo_spark.operators.sampling import (
            stratified_sample,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        lo = {r["doc_id"] for r in stratified_sample(
            d, "lang", {"en": 0.2}, default_rate=0.3).select("doc_id").collect()}
        hi = {r["doc_id"] for r in stratified_sample(
            d, "lang", {"en": 0.6}, default_rate=0.3).select("doc_id").collect()}
        assert lo < hi  # strict subset: only en rows were added
        # determinism: identical re-run
        again = {r["doc_id"] for r in stratified_sample(
            d, "lang", {"en": 0.2}, default_rate=0.3).select("doc_id").collect()}
        assert again == lo
        # rough calibration on the en stratum at rate 0.6
        n_en = d.where(F.col("lang") == "en").count()
        n_en_kept = d.where(F.col("lang") == "en").join(
            spark.createDataFrame([(i,) for i in hi], ["doc_id"]), "doc_id"
        ).count()
        assert 0.4 * n_en < n_en_kept < 0.8 * n_en

    def test_contamination_check_flags_planted_canary(self, spark, sf_dir):
        """Decontamination primitive: exactly the corpus docs carrying the
        planted benchmark passage are flagged; the plan broadcasts the
        benchmark shingle set (no corpus shuffle before the per-doc count)."""
        from embulk_input_marketo_spark.plans.queries import QUERIES

        rows = {r["doc_id"]: r for r in
                QUERIES["contamination_check"](spark, sf_dir).collect()}
        hit = {i for i, r in rows.items() if r["n_contaminated"] > 0}
        planted = {i for i in rows if i % 17 == 0}
        # every planted doc is flagged; extra hits are the fixture's organic
        # near-duplicates of benchmark docs (genuine leakage — also correct)
        assert planted and planted <= hit
        assert any(r["n_contaminated"] == 0 for r in rows.values())
        # the 8-word canary contributes its 4 fully-internal 5-shingles
        # (straddling windows mix in per-doc words and differ per side)
        assert all(rows[i]["n_contaminated"] >= 4 for i in planted)

    def test_corpus_operator_plans(self, spark, sf_dir):
        """Plan audits for the new corpus operators: contamination joins the
        benchmark shingles as a BROADCAST hash join (corpus never shuffles
        before its per-doc count); boilerplate never degenerates into a
        cartesian/nested-loop join and stays within its budgeted shuffles."""
        from embulk_input_marketo_spark.plans.queries import QUERIES

        cont = QUERIES["contamination_check"](spark, sf_dir)
        plan = cont._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

        boil = QUERIES["boilerplate_passages"](spark, sf_dir)
        bplan = boil._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in bplan
        assert "BroadcastNestedLoopJoin" not in bplan
        assert bplan.count("Exchange") <= 8  # shuffles stay 8-byte-keyed & few

    def test_pack_documents_exact_bins(self, spark):
        """Greedy offset-based packing: bin = floor(tokens_before / budget);
        a doc straddling the boundary stays in its start bin (no splitting),
        and the next doc lands by its own offset."""
        from embulk_input_marketo_spark.operators.sampling import pack_documents

        mk = lambda n: " ".join(["w"] * n)  # noqa: E731
        df = spark.createDataFrame(
            [(1, "x", mk(1000)), (2, "x", mk(1000)), (3, "x", mk(1000)),
             (4, "x", mk(1000)), (5, "y", mk(5000)), (6, "y", mk(10))],
            ["doc_id", "lang", "text"],
        )
        out = {r["doc_id"]: (r["n_tokens"], r["bin_id"]) for r in
               pack_documents(df, 2048, strata_col="lang").collect()}
        # x: offsets 0,1000,2000,3000 → bins 0,0,0,1 (doc 3 straddles)
        assert [out[i][1] for i in (1, 2, 3, 4)] == [0, 0, 0, 1]
        # y: the oversized doc owns bin 0; the next starts at offset 5000 → 2
        assert out[5] == (5000, 0) and out[6] == (10, 2)

    def test_point_lookup_prunes_to_one_bucket(self, spark, tmp_path):
        """table.lookup(key) reads only the key's hash bucket (the plan
        scans that bucket's files, not the table) and returns exactly the
        LWW-current row — including across unmerged MoR generations."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=16,
        )
        merge_batch(
            spark, table,
            _batch(spark, [(f"u{i}", i, i, "U", i) for i in range(64)]),
            batch_id="seed", lsn_col="lsn",
        )
        # a second, unmerged generation that updates u7
        merge_batch(
            spark, table, _batch(spark, [("u7", 100, 70.0, "U", 100)]),
            batch_id="upd", lsn_col="lsn", compact_threshold=100,
        )
        got = table.lookup(spark, "u7")
        rows = got.collect()
        assert [(r["url"], r["value"]) for r in rows] == [("u7", 70.0)]
        # plan audit: the scan's file count is the one bucket's, not all 16+
        plan = got._jdf.queryExecution().executedPlan().toString()
        import re as _re

        n_files = sum(
            int(x) for x in _re.findall(r"number of files[^0-9]*(\d+)", plan)
        ) or plan.count("FileScan")
        m = table.manifest()
        total_files = sum(len(m.files[b]) for b in set(m.files))
        bucket_files = max(len(m.files[b]) for b in set(m.files))
        assert total_files > bucket_files  # many buckets exist
        # the lookup's union reads at most the one bucket's generations
        scans = plan.count("Scan parquet")
        assert scans <= 2  # one per generation group of ONE bucket
        # absent key: empty, still single-bucket
        assert table.lookup(spark, "no-such-key").count() == 0

    def test_change_data_feed_kinds_and_bucket_pruning(self, spark, tmp_path):
        """changes(v1, v2) classifies insert/update/delete per key and its
        candidate set comes from the manifest pointer diff — only the second
        batch's buckets are scanned, not the table."""
        table = LakeTable.create(
            str(tmp_path / "t"), SCHEMA, key_col="url", lww_major="warc_ts",
            n_buckets=16,
        )
        merge_batch(
            spark, table,
            _batch(spark, [(f"u{i}", i, float(i), "U", i) for i in range(64)]),
            batch_id="seed", lsn_col="lsn", compact_threshold=100,
        )
        v1 = table.current_version()
        merge_batch(
            spark, table,
            _batch(spark, [("u1", 100, 11.0, "U", 100),
                           ("u2", 101, 0.0, "D", 101),
                           ("u999", 102, 99.0, "I", 102)]),
            batch_id="b2", lsn_col="lsn", compact_threshold=100,
        )
        cdf = table.changes(spark, v1)
        got = {r["url"]: (r["_change"], r["value"]) for r in cdf.collect()}
        assert got == {
            "u1": ("update", 11.0),
            "u2": ("delete", 2.0),     # delete carries the last-known row
            "u999": ("insert", 99.0),
        }
        # bucket pruning: candidate buckets are the ptr-diff, i.e. ≤3 of 16+
        plan = cdf._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") <= 6

    def test_pending_manifest_cannot_serialize(self, tmp_path):
        """A FileSet with un-flushed pending buckets must not silently
        serialize (the side files would be missing)."""
        from embulk_input_marketo_spark.lake.table import FileSet, Manifest

        m = Manifest(
            version=1, parent=0, key_col="url", lww_major="warc_ts",
            n_buckets=8, schema_version=1, schemas={"1": SCHEMA.jsonValue()},
            renames=[], files=FileSet(str(tmp_path), pending={"0": []}),
            applied_batches=[], checkpoint={}, summary={}, committed_at=0.0,
        )
        with pytest.raises(ValueError, match="pending"):
            m.to_json()
