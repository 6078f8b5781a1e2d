"""Round-4 corpus operators: Gopher quality rules, hashed linear
classifier, token-budget corpus mixing, dedup apply, domain blocklist."""

import pytest
from pyspark.sql import functions as F

from embulk_input_marketo_spark.functions import textops
from embulk_input_marketo_spark.operators import dedup_docs
from embulk_input_marketo_spark.operators.sampling import corpus_mix


def _flags_row(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    flags = textops.gopher_flags("text", **kw)
    return df.select(
        *[v.alias(k) for k, v in flags.items()]
    ).collect()[0].asDict()


class TestGopherFlags:
    def test_clean_doc_keeps(self, spark):
        r = _flags_row(
            spark,
            "the quick brown fox jumps over and over the lazy dog of town",
        )
        assert r["keep"] is True
        assert r["ok_word_count"] and r["ok_stopwords"]

    def test_too_few_words_rejected(self, spark):
        r = _flags_row(spark, "the and of it")
        assert r["ok_word_count"] is False and r["keep"] is False

    def test_symbol_ratio_rejects(self, spark):
        # 12 words, 3 ellipses -> ratio 0.25 > 0.1
        r = _flags_row(
            spark,
            "the cat and dog of ... town ran ... far away ... quickly now",
        )
        assert r["ok_symbol_ratio"] is False and r["keep"] is False

    def test_non_alpha_words_rejected(self, spark):
        # >20% pure-number words
        r = _flags_row(
            spark,
            "the 11 22 33 44 55 66 and of data rows go 77 88 99 00",
        )
        assert r["ok_alpha_words"] is False and r["keep"] is False

    def test_mean_word_len_bounds(self, spark):
        short = _flags_row(spark, "a b c d e f g h i j k l m n o p")
        assert short["ok_mean_word_len"] is False
        long = _flags_row(
            spark,
            " ".join(["extraordinarily"] * 12),
        )
        assert long["ok_mean_word_len"] is False

    def test_stopword_floor(self, spark):
        r = _flags_row(
            spark,
            "quick brown fox jumps over lazy dog near tall green trees daily",
        )
        assert r["stopword_hits"] < 2 and r["ok_stopwords"] is False


class TestHashedClassifier:
    def test_deterministic_and_exact(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "alpha beta gamma")],
            "doc_id long, text string",
        )
        cols = textops.hashed_classifier_score("text")
        out = df.select("doc_id", *[v.alias(k) for k, v in cols.items()])
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[0]["weight_sum"] == rows[1]["weight_sum"]
        # recompute one token weight in python: md5 hex -> int -> centered
        import hashlib

        def w(tok):
            h = hashlib.md5((tok + "|w7").encode()).hexdigest()[:4]
            return int(h, 16) % 1001 - 500

        expect = sum(w(t) for t in "alpha beta gamma".split())
        assert rows[0]["weight_sum"] == expect
        assert rows[0]["clf_score"] == round(expect / (500.0 * 3), 6)

    def test_score_bounded(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cols = textops.hashed_classifier_score("text")
        bad = docs.select(cols["clf_score"].alias("s")).where(
            (F.col("s") > 1.0) | (F.col("s") < -1.0)
        )
        assert bad.count() == 0


class TestCorpusMix:
    def test_budget_monotone_and_rate_shape(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        w = {"src0": 2.0, "src1": 1.0}
        small = corpus_mix(docs, w, budget_tokens=2000)
        big = corpus_mix(docs, w, budget_tokens=8000)
        s_ids = {r["doc_id"] for r in small.collect()}
        b_ids = {r["doc_id"] for r in big.collect()}
        # monotone: raising the budget only ADDS documents
        assert s_ids <= b_ids
        # unlisted sources are dropped entirely
        srcs = {r["source"] for r in big.select("source").distinct().collect()}
        assert srcs <= {"src0", "src1"}

    def test_rate_clamps_at_one(self, spark):
        docs = spark.createDataFrame(
            [(i, "srcA", "one two three") for i in range(20)],
            "doc_id long, source string, text string",
        )
        out = corpus_mix(
            docs, {"srcA": 1.0}, budget_tokens=10_000_000
        )
        rows = out.collect()
        assert len(rows) == 20  # rate 1.0 keeps everything
        assert all(r["rate"] == 1.0 for r in rows)

    def test_corpus_never_shuffles_wide(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = corpus_mix(docs, {"src0": 1.0}, budget_tokens=1000)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the totals side broadcasts; the corpus side must not sort-merge
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestDedupApply:
    def test_copies_removed_originals_kept(self, spark):
        docs = spark.createDataFrame(
            [(0, "aa bb cc dd ee ff gg hh"),
             (1, "zz yy xx ww vv uu tt ss"),
             (100000, "aa bb cc dd ee ff gg hh")],  # copy of 0
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(0, 100000)], "left_id long, right_id long"
        )
        kept = dedup_docs.apply_dedup(docs, pairs)
        ids = sorted(r["doc_id"] for r in kept.collect())
        assert ids == [0, 1]
        # payload columns survive the semi-join
        assert set(kept.columns) == {"doc_id", "text"}

    def test_quality_survivor(self, spark):
        docs = spark.createDataFrame(
            [(0, "t", 0.1), (1, "t", 0.9)],
            "doc_id long, text string, q double",
        )
        pairs = spark.createDataFrame(
            [(0, 1)], "left_id long, right_id long"
        )
        kept = dedup_docs.apply_dedup(docs, pairs, quality_col="q")
        assert [r["doc_id"] for r in kept.collect()] == [1]


class TestDomainBlocklist:
    def test_blocklist_join_broadcasts(self, spark, sf_dir):
        from embulk_input_marketo_spark.plans.queries import (
            q_domain_blocklist,
        )

        out = q_domain_blocklist(spark, sf_dir)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        hosts = {r["host"] for r in out.select("host").distinct().collect()}
        blocked = {f"site-{k}.example.com" for k in range(0, 40, 5)}
        assert hosts.isdisjoint(blocked)
        assert len(hosts) == 32  # 40 sites minus 8 blocked


class TestIncrementalAgg:
    def _feed(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp long, ival long, _change string"
        )

    def test_signed_delta_and_merge(self, spark):
        from embulk_input_marketo_spark.lake.incremental import (
            incremental_agg_delta,
            merge_agg_delta,
        )

        base = spark.createDataFrame(
            [(0, 2, 100), (1, 1, 50)], "grp long, n_rows long, vsum long"
        )
        feed = self._feed(
            spark,
            [
                (0, 30, "insert"),            # +1 row, +30
                (0, 40, "update_preimage"),   # -40
                (0, 45, "update_postimage"),  # +5 net, rows unchanged
                (1, 50, "delete"),            # group 1 empties out
                (2, 7, "insert"),             # brand-new group
            ],
        )
        delta = incremental_agg_delta(feed, ["grp"], "ival")
        out = {
            r["grp"]: (r["n_rows"], r["vsum"])
            for r in merge_agg_delta(base, delta, ["grp"]).collect()
        }
        assert out == {0: (3, 135), 2: (1, 7)}  # group 1 dropped at zero

    def test_plain_update_raises(self, spark):
        from embulk_input_marketo_spark.lake.incremental import (
            incremental_agg_delta,
        )

        feed = self._feed(spark, [(0, 1, "update")])
        delta = incremental_agg_delta(feed, ["grp"], "ival")
        with pytest.raises(Exception, match="include_preimage"):
            delta.collect()

    def test_incremental_equals_recompute_on_lake(self, spark, sf_dir):
        """The end-to-end property: rollup maintained from the pre-image
        feed == rollup recomputed from the final table."""
        from embulk_input_marketo_spark.plans.queries import (
            q_cdf_incremental_agg,
        )

        inc = {
            r["grp"]: (r["n_rows"], r["vsum"])
            for r in q_cdf_incremental_agg(spark, sf_dir).collect()
        }
        # recompute from the raw events via the flagship final-state query
        from embulk_input_marketo_spark.plans.queries import q_cdc_final_state

        fin = q_cdc_final_state(spark, sf_dir)
        full = {
            r["grp"]: (r["n_rows"], r["vsum"])
            for r in fin.select(
                (F.col("user_id").cast("long") % 16).alias("grp"),
                F.coalesce(
                    F.floor(F.col("value") * 1000).cast("long"), F.lit(0)
                ).alias("ival"),
            )
            .groupBy("grp")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("ival").cast("long").alias("vsum"),
            )
            .collect()
        }
        assert inc == full


class TestZorder:
    def test_interleave_matches_reference(self, spark):
        from embulk_input_marketo_spark.functions import zorder

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5), (2**31 - 1, 2**31 - 1),
             (12345, 67890)],
            "a long, b long",
        )
        out = df.select(
            "a", "b",
            zorder.zorder_key(
                zorder.dim_from_long("a"), zorder.dim_from_long("b")
            ).alias("z"),
        ).collect()

        def spread(x):
            x &= 0xFFFFFFFF
            for sh, m in [(16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                          (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                          (1, 0x5555555555555555)]:
                x = (x | (x << sh)) & m
            return x

        for r in out:
            assert r["z"] == spread(r["a"]) | (spread(r["b"]) << 1)
            assert r["z"] >= 0  # 31-bit dims keep the sign bit clear

    def test_string_prefix_dim_order_preserving(self, spark):
        from embulk_input_marketo_spark.functions import zorder

        df = spark.createDataFrame(
            [("a",), ("ab",), ("b",), ("ba",), ("zzzz",), ("",), (None,)],
            "s string",
        )
        rows = df.select(
            "s", zorder.dim_from_string_prefix("s").alias("d")
        ).collect()
        d = {r["s"]: r["d"] for r in rows}
        assert d["a"] < d["ab"] < d["b"] < d["ba"] < d["zzzz"]
        assert d[""] == d[None] == 0

    def test_compaction_zorder_content_identical(self, spark, tmp_path):
        """compact_buckets(zorder_by=...) reorders rows inside files only —
        read-back content and point lookup are unchanged."""
        from pyspark.sql import types as T

        from embulk_input_marketo_spark.functions.compare import (
            assert_same_state,
        )
        from embulk_input_marketo_spark.lake import LakeTable
        from embulk_input_marketo_spark.lake.merge import (
            compact_buckets,
            merge_batch,
        )

        schema = T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ])
        tbl = LakeTable.create(
            str(tmp_path / "t"), schema, key_col="url",
            lww_major="warc_ts", n_buckets=4,
        )
        df = spark.range(200).select(
            F.concat(F.lit("u"), F.col("id")).alias("url"),
            F.timestamp_seconds(F.col("id") * 60 + 1_000_000).alias(
                "warc_ts"
            ),
            (F.col("id") * 1.5).alias("value"),
            F.lit("I").alias("op"),
            F.col("id").alias("_lsn"),
        )
        merge_batch(spark, tbl, df, batch_id="b1")
        before = tbl.read(spark)
        compact_buckets(
            spark, tbl, list(range(4)), zorder_by=["url", "warc_ts"]
        )
        after = tbl.read(spark)
        assert_same_state(before, after)
        got = tbl.lookup(spark, "u7").collect()
        assert len(got) == 1 and got[0]["value"] == 10.5


class TestSemanticDedup:
    """SemDeDup: cluster -> within-cell cosine pairs -> components ->
    min-id survivor. Cell-assignment exactness vs an external engine is
    the oracle gate's job (`semantic_dedup` query); here: pipeline
    semantics on planted clusters and the rounded-argmax tie rule."""

    def _planted(self, spark):
        # two tight clusters along orthogonal axes + one far singleton:
        # ids 0-2 near e0, ids 10-12 near e1, id 99 along (1,1,...)/norm
        rows = []
        for i, base in ((0, 0), (10, 1)):
            for j in range(3):
                v = [0.0] * 8
                v[base] = 1.0
                v[(base + 2) % 8] = 0.001 * j  # tiny perturbation
                rows.append((i + j, v))
        rows.append((99, [1.0] * 8))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_groups_resolve_min_id_survivor(self, spark):
        from embulk_input_marketo_spark.functions.similarity import (
            semantic_dedup,
        )

        # n_cells=1: assignment is trivial, so the test pins the
        # pair->component->survivor semantics independent of the draw
        out = semantic_dedup(
            self._planted(spark), n_cells=1, threshold=0.99
        ).collect()
        got = {r["vec_id"]: (r["component_id"], r["keep"]) for r in out}
        assert got == {
            0: (0, True), 1: (0, False), 2: (0, False),
            10: (10, True), 11: (10, False), 12: (10, False),
            99: (99, True),
        }

    def test_pairs_respect_cell_boundary(self, spark):
        from embulk_input_marketo_spark.functions.similarity import (
            semantic_dedup_pairs,
        )

        # force the two cluster axes into DIFFERENT cells by passing
        # explicit centroids: identical vectors in different cells must
        # never pair, whatever their cosine
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0] + [0.0] * 6), (1, [0.0, 1.0] + [0.0] * 6)],
            "cell_id int, centroid array<double>",
        )
        pairs = semantic_dedup_pairs(
            self._planted(spark), threshold=0.99, centroids=cents
        ).collect()
        ids = {(r["left_id"], r["right_id"]) for r in pairs}
        # within-cluster pairs only; 99 assigns to one cell but pairs with
        # neither tight cluster at 0.99
        assert ids == {(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)}

    def test_rounded_argmax_breaks_ties_to_larger_cell(self, spark):
        from embulk_input_marketo_spark.functions.similarity import (
            assign_cells,
        )

        # two IDENTICAL centroids in cells 0 and 1: rounded scores tie
        # exactly, struct-max picks the larger cell id (the documented,
        # oracle-replayable rule: ORDER BY s DESC, cell_id DESC)
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
            "cell_id int, centroid array<double>",
        )
        df = spark.createDataFrame(
            [(7, [0.6, 0.8])], "vec_id long, embedding array<double>"
        )
        got = assign_cells(df, cents, round_scores=6).collect()[0]["_cell"]
        assert got == 1


class TestKMeansRefine:
    """Lloyd refinement over a centroid table: convergence to the exact
    cluster means on separated clusters, and the empty-cell carry-over
    rule. Cross-engine trajectory exactness (rounded means, rounded
    argmax) is the `kmeans_refine_stats` oracle's job."""

    def _two_clusters(self, spark):
        # 4 points around (1,0) and 4 around (0,1), displaced +-0.1 along
        # the other axis so the per-cluster mean is exactly the axis point
        rows = []
        for i, (x, y) in enumerate([(1.0, -0.1), (1.0, 0.1)] * 2):
            rows.append((i, [x, y]))
        for i, (x, y) in enumerate([(-0.1, 1.0), (0.1, 1.0)] * 2):
            rows.append((10 + i, [x, y]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_converges_to_cluster_means(self, spark):
        from embulk_input_marketo_spark.functions.similarity import (
            kmeans_refine,
        )

        # init each centroid at one (off-mean) member of its cluster
        cents = spark.createDataFrame(
            [(0, [1.0, -0.1]), (1, [-0.1, 1.0])],
            "cell_id int, centroid array<double>",
        )
        out = kmeans_refine(
            self._two_clusters(spark), cents, n_iters=1
        ).collect()
        got = {r["cell_id"]: r["centroid"] for r in out}
        assert got == {0: [1.0, 0.0], 1: [0.0, 1.0]}
        # a second iteration is a fixed point
        out2 = kmeans_refine(
            self._two_clusters(spark), cents, n_iters=2
        ).collect()
        assert {r["cell_id"]: r["centroid"] for r in out2} == got

    def test_empty_cell_keeps_previous_centroid(self, spark):
        from embulk_input_marketo_spark.functions.similarity import (
            kmeans_refine,
        )

        # cells 0 and 1 share an IDENTICAL centroid: every assignment ties
        # and the rounded argmax routes ALL rows to the larger cell id, so
        # cell 0 goes empty and must carry its previous centroid forward
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
            "cell_id int, centroid array<double>",
        )
        df = spark.createDataFrame(
            [(1, [1.0, 0.2]), (2, [1.0, -0.2])],
            "vec_id long, embedding array<double>",
        )
        out = kmeans_refine(df, cents, n_iters=1).collect()
        got = {r["cell_id"]: r["centroid"] for r in out}
        assert got[0] == [1.0, 0.0]
        assert got[1] == [1.0, 0.0]  # mean of the two members


class TestTrainingShards:
    """Shard writer sink: deterministic assignment, round-trip manifest
    verification, partition pruning for per-rank reads. Cross-engine
    assignment exactness is the `training_shards` oracle's job."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, f"doc {i} body word{i % 3}") for i in range(200)],
            "doc_id long, text string",
        )

    def test_assignment_stable_under_subsetting(self, spark):
        from embulk_input_marketo_spark.operators.shards import assign_shards

        full = {
            r["doc_id"]: r["shard_id"]
            for r in assign_shards(self._docs(spark), 8).collect()
        }
        sub = {
            r["doc_id"]: r["shard_id"]
            for r in assign_shards(
                self._docs(spark).where("doc_id % 2 = 0"), 8
            ).collect()
        }
        assert sub == {k: v for k, v in full.items() if k % 2 == 0}
        assert set(full.values()) <= set(range(8))

    def test_roundtrip_verifies_and_tamper_detected(self, spark, tmp_path):
        import glob
        import os

        from embulk_input_marketo_spark.operators.shards import (
            read_training_shards,
            verify_shards,
            write_training_shards,
        )

        path = str(tmp_path / "shards")
        manifest = write_training_shards(self._docs(spark), path, 8)
        assert sorted(int(k) for k in manifest["shards"]) == sorted(
            {int(k) for k in manifest["shards"]}
        )
        assert sum(v["n_docs"] for v in manifest["shards"].values()) == 200
        ok = verify_shards(spark, path)
        assert all(r["ok"] for r in ok.collect())
        # round-trip content identity
        df, _ = read_training_shards(spark, path)
        assert df.count() == 200
        # tamper: drop one shard's files -> that shard flags, others hold
        victim = sorted(manifest["shards"])[0]
        for f in glob.glob(os.path.join(path, f"shard_id={victim}", "*")):
            os.remove(f)
        flags = {
            r["shard_id"]: bool(r["ok"]) if r["ok"] is not None else False
            for r in verify_shards(spark, path).collect()
        }
        assert flags[int(victim)] is False
        assert all(v for k, v in flags.items() if k != int(victim))

    def test_shard_id_read_prunes_partitions(self, spark, tmp_path):
        from embulk_input_marketo_spark.operators.shards import (
            read_training_shards,
            write_training_shards,
        )

        path = str(tmp_path / "shards")
        write_training_shards(self._docs(spark), path, 8)
        df, _ = read_training_shards(spark, path, shard_ids=[3])
        plan = df._jdf.queryExecution().executedPlan().toString()
        # partition filter present and only shard 3's rows survive
        assert all(r["shard_id"] == 3 for r in df.collect())
        assert "shard_id" in plan


class TestRemoveRepeatedLines:
    def _corpus(self, spark):
        banner = "We use cookies here"
        rows = [
            # docs 0-3 all carry the banner (df=4 >= 3) -> removed
            (0, banner + "\nalpha unique body zero\n   "),
            (1, banner + "\nbeta unique body one\n   "),
            (2, banner + "\ngamma unique body two\n   "),
            # doc 3 carries it TWICE -> both instances removed
            (3, banner + "\ndelta unique body three\n" + banner + "\n   "),
            # doc 4 has no boilerplate -> byte-identical passthrough
            (4, "epsilon unique body four\n   "),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_removal_keeps_order_and_blank_lines(self, spark):
        out = {
            r["doc_id"]: r
            for r in dedup_docs.remove_repeated_lines(
                self._corpus(spark), min_docs=3
            ).collect()
        }
        assert out[0]["clean_text"] == "alpha unique body zero\n   "
        assert out[0]["n_removed"] == 1 and out[0]["n_lines"] == 3
        # whitespace-only line appears in ALL docs but is never removed
        assert out[1]["clean_text"].endswith("\n   ")

    def test_instance_count_removal(self, spark):
        out = {
            r["doc_id"]: r
            for r in dedup_docs.remove_repeated_lines(
                self._corpus(spark), min_docs=3
            ).collect()
        }
        assert out[3]["n_removed"] == 2
        assert out[3]["clean_text"] == "delta unique body three\n   "

    def test_untouched_doc_is_byte_identical(self, spark):
        src = self._corpus(spark)
        out = {
            r["doc_id"]: r
            for r in dedup_docs.remove_repeated_lines(src, min_docs=3).collect()
        }
        original = {r["doc_id"]: r["text"] for r in src.collect()}
        assert out[4]["clean_text"] == original[4]
        assert out[4]["n_removed"] == 0

    def test_min_chars_protects_short_lines(self, spark):
        rows = [(i, "ok\nunique line %d" % i) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup_docs.remove_repeated_lines(
            df, min_docs=3, min_chars=3
        ).collect()
        assert all(r["n_removed"] == 0 for r in out)
        # with the guard off, the common short line goes
        out2 = {
            r["doc_id"]: r
            for r in dedup_docs.remove_repeated_lines(
                df, min_docs=3, min_chars=1
            ).collect()
        }
        assert all(r["n_removed"] == 1 for r in out2.values())
        assert out2[0]["clean_text"] == "unique line 0"
