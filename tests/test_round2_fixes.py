"""Round-2 fixes, each paired to a VERDICT/ADVICE finding:

- default error-code retry matrix (reference MarketoBaseRestClient.java:
  247-300; test style of MarketoBaseRestClientTest.java:279-333)
- ACCEPT stray-quote fallback parser (CsvTokenizer.java:764-780)
- column-prefix golden names (MarketoUtils.buildColumnName:95-98)
- distinct parent ids (ProgramMembersBulkExtractInputPlugin.java:107-118)
- applied-batches manifest retirement (bounded metadata at 10^5 batches)
- null-merge-key quarantine (commit path must not crash; counted drop)
- empty-batch staging cleanup (no orphan dirs)
- two streams into one table (stream-scoped idempotence, no data loss)
- SimHash Hamming-banded search + winnowing fingerprints on perturbed docs
- multi-probe ANN recall vs the exact brute force
"""

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from embulk_input_marketo_spark import generator
from embulk_input_marketo_spark.functions import similarity, textops
from embulk_input_marketo_spark.lake import LakeTable, merge_batch
from embulk_input_marketo_spark.operators import dedup_docs
from embulk_input_marketo_spark.reliability import ServiceError, default_classify
from embulk_input_marketo_spark.replay import replay


# ---------------------------------------------------------------- reliability

@pytest.mark.parametrize("code,verdict", [
    ("601", "renew"), ("602", "renew"),            # token invalid/expired
    ("606", "rate_limit"),                          # rate limit exceeded
    ("604", "retry"), ("608", "retry"), ("611", "retry"),
    ("615", "retry"), ("713", "retry"), ("1029", "retry"),
    ("600", "fail"), ("610", "fail"), ("1013", "fail"),  # bad request/no data
])
def test_default_retry_code_matrix(code, verdict):
    assert default_classify(ServiceError(code, "x")) == verdict


def test_default_classify_transport_and_unknown():
    assert default_classify(ConnectionError("reset")) == "retry"
    assert default_classify(TimeoutError()) == "retry"
    assert default_classify(ValueError("bug")) == "fail"


def test_default_policy_fails_fast_on_unknown_code():
    from embulk_input_marketo_spark.reliability import (
        RetryGiveUpError, RetryPolicy, execute_with_retry,
    )

    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise ServiceError("600", "empty access token")

    with pytest.raises(RetryGiveUpError) as ei:
        execute_with_retry(fn, RetryPolicy(sleeper=lambda s: None))
    assert ei.value.attempts == 1 and calls["n"] == 1


def test_default_policy_retries_transient_code():
    from embulk_input_marketo_spark.reliability import (
        RetryPolicy, execute_with_retry,
    )

    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ServiceError("606", "rate limit")
        return "ok"

    waits = []
    assert execute_with_retry(fn, RetryPolicy(sleeper=waits.append)) == "ok"
    assert waits == [20.0, 20.0]  # rate-limit interval, not backoff


# ------------------------------------------------------------- csv stray mode

def test_accept_stray_quotes_parser(spark, tmp_path):
    p = str(tmp_path / "stray.csv")
    with open(p, "w") as f:
        f.write(
            'id,name,notes\n'
            '1,Ann "the hammer" Lee,plain\n'          # stray quotes kept
            '2,"wrapped, almost",x\n'                  # fully wrapped unwraps
            '# a comment line\n'
            '\n'
            '3,say ""hi"",null\n'                      # null string -> NULL
        )
    from embulk_input_marketo_spark.sources.csv_source import accept_stray_quotes

    rows = {
        r["id"]: (r["name"], r["notes"])
        for r in accept_stray_quotes(spark, p, comment="#").collect()
    }
    assert rows["1"] == ('Ann "the hammer" Lee', "plain")
    # the wrapped field contained the delimiter → the mode's no-delimiters
    # assumption splits it (documented reference behavior for ACCEPT mode)
    assert rows["2"][0] == '"wrapped'
    assert rows["3"] == ('say ""hi""', None)  # not wrapped → quotes literal
    assert set(rows) == {"1", "2", "3"}


# ----------------------------------------------------------- dispatch surface

def test_prefix_golden_column_names(spark):
    from embulk_input_marketo_spark.dispatch import TargetConfig, _prefix

    df = spark.createDataFrame([(1, "a", "b")], ["id", "name", "status"])
    out = _prefix(df, TargetConfig(target="lead"), keep={"id"})
    # MarketoUtils.buildColumnName: prefix + '_' + name; key columns verbatim
    assert out.columns == ["id", "mk_name", "mk_status"]
    out2 = _prefix(df, TargetConfig(target="lead", column_prefix="x"), keep=set())
    assert out2.columns == ["x_id", "x_name", "x_status"]


def test_duplicate_parent_ids_do_not_duplicate_rows(spark):
    from embulk_input_marketo_spark.dispatch import TargetConfig, dispatch

    log = generator.changelog(spark, 500, 50, seed=3).select(
        "lsn", "op", "url", "warc_ts"
    )
    # pick parent ids that actually occur under the synthesized parent key
    present = [
        r["k"]
        for r in log.select(
            F.pmod(F.xxhash64("url"), F.lit(1000)).cast("string").alias("k")
        ).distinct().limit(2).collect()
    ]
    p1, p2 = present[0], present[1]
    base = TargetConfig(target="all_lead_with_list_id",
                        parent_ids=[p1, p2], from_lsn=-1,
                        extra={"synthesize_membership": True})
    dup = TargetConfig(target="all_lead_with_list_id",
                       parent_ids=[p1, p1, p2, f" {p2} "], from_lsn=-1,
                       extra={"synthesize_membership": True})
    n_base = dispatch(spark, log, base).count()
    n_dup = dispatch(spark, log, dup).count()
    assert n_base > 0
    assert n_dup == n_base


# -------------------------------------------------------- manifest retirement

def test_applied_batches_stay_bounded_over_many_batches(spark, tmp_path):
    log = generator.changelog(spark, 2_000, 200, seed=5)
    schema = T.StructType(
        [f for f in log.schema.fields if f.name not in ("lsn", "op", "schema_version")]
    )
    table = LakeTable.create(str(tmp_path / "t"), schema, n_buckets=8)
    report = replay(spark, log, table, batch_span=40)  # 50 slices
    assert len(report.batches) == 50
    m = table.manifest()
    # every window entry retires the moment its hi ≤ committed hwm — the
    # manifest must NOT grow O(#batches) (round-1 scale finding)
    assert len(m.applied_batches) <= 1
    assert int(m.checkpoint["hwm_lsn"]) == 1_999
    # idempotence survives retirement: a full re-run applies nothing
    r2 = replay(spark, log, table, batch_span=40)
    assert r2.events_applied == 0 and table.current_version() == m.version


def test_retired_window_reapply_is_noop(spark, tmp_path):
    log = generator.changelog(spark, 1_000, 100, seed=6)
    schema = T.StructType(
        [f for f in log.schema.fields if f.name not in ("lsn", "op", "schema_version")]
    )
    table = LakeTable.create(str(tmp_path / "t"), schema, n_buckets=4)
    replay(spark, log, table, batch_span=250)
    v = table.current_version()
    # re-apply an OLD window explicitly (its applied-batches entry retired):
    # the hwm gate must answer for it
    batch = (
        log.where(F.col("lsn") < 250).drop("schema_version")
        .withColumnRenamed("lsn", "_lsn")
    )
    r = merge_batch(spark, table, batch, batch_id="anything",
                    window=(-1, 249), checkpoint={"hwm_lsn": 249})
    assert not r.applied
    assert table.current_version() == v

    # an ad-hoc batch that carries a checkpoint but declares NO window must
    # APPLY — the old checkpoint-keyed gate silently dropped it (r2 ADVICE)
    one = batch.limit(1)
    r2 = merge_batch(spark, table, one, batch_id="adhoc-ckpt",
                     checkpoint={"hwm_lsn": 249})
    assert r2.applied
    # ...and its stale checkpoint must not rewind the monotone hwm
    assert int(table.checkpoint()["hwm_lsn"]) == 999

    # a window straddling the committed hwm is a protocol violation
    import pytest as _pytest
    with _pytest.raises(ValueError, match="straddles"):
        merge_batch(spark, table, batch, batch_id="straddle",
                    window=(100, 999_999))


# ------------------------------------------------- null keys / empty batches

def _mini_table(tmp_path, name="t"):
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ])
    return LakeTable.create(str(tmp_path / name), schema, key_col="url",
                            lww_major="warc_ts", n_buckets=4)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_null_merge_keys_are_quarantined_not_fatal(spark, tmp_path, mode):
    table = _mini_table(tmp_path, f"t_{mode}")
    batch = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 1, "I", 1),
         (None, "2024-01-01 00:00:01", 2, "I", 2),
         ("u2", "2024-01-01 00:00:02", 3, "I", 3),
         (None, "2024-01-01 00:00:03", 4, "D", 4)],
        ["url", "warc_ts", "v", "op", "_lsn"],
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    r = merge_batch(spark, table, batch, batch_id="b1", mode=mode)
    assert r.applied and r.rows_in == 2 and r.rows_null_key == 2
    assert table.manifest().summary["rows_null_key"] == 2
    state = {x["url"] for x in table.read(spark).collect()}
    assert state == {"u1", "u2"}


def test_all_null_key_batch_is_noop_and_counted(spark, tmp_path):
    table = _mini_table(tmp_path)
    batch = spark.createDataFrame(
        [(None, "2024-01-01 00:00:00", 1, "I", 1)],
        "url string, warc_ts string, v long, op string, _lsn long",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    v0 = table.current_version()
    r = merge_batch(spark, table, batch, batch_id="b_null")
    assert not r.applied and r.rows_null_key == 1
    assert table.current_version() == v0


def test_empty_batch_leaves_no_orphan_staging(spark, tmp_path):
    table = _mini_table(tmp_path)
    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, v long, op string, _lsn long"
    )
    v0 = table.current_version()
    r = merge_batch(spark, table, empty, batch_id="b_empty")
    assert not r.applied
    assert table.current_version() == v0
    # staging dirs are unique-per-attempt (snap-<v>-<nonce>): assert NO
    # attempt dir for v0+1 survived, not just one specific name
    import glob

    leftovers = glob.glob(
        os.path.join(table.data_dir, f"snap-{v0 + 1:012d}*")
    )
    assert leftovers == []


# --------------------------------------------------------- streaming identity

def test_stream_instance_id_tracks_checkpoint_lifetime(tmp_path):
    import shutil

    from embulk_input_marketo_spark.streaming.stream_replay import (
        _stream_instance_id,
    )

    ck = str(tmp_path / "ck")
    a = _stream_instance_id(ck)
    assert _stream_instance_id(ck) == a          # resume → same identity
    shutil.rmtree(ck)
    assert _stream_instance_id(ck) != a          # wiped → new identity


def test_second_stream_into_same_table_applies(spark, tmp_path):
    """Round-1 data-loss bug: epoch ids restart at 0 for a new checkpoint,
    colliding with applied batch ids — the second stream was silently
    swallowed. Stream-scoped channels must apply BOTH streams' data."""
    from embulk_input_marketo_spark.functions.compare import assert_same_state
    from embulk_input_marketo_spark.streaming.stream_replay import stream_replay

    log1_dir = str(tmp_path / "log1")
    log2_dir = str(tmp_path / "log2")
    log1 = generator.changelog(spark, 2_000, 150, seed=21)
    log1.write.parquet(log1_dir)
    # second stream: disjoint urls, disjoint lsns — union is the oracle
    generator.changelog(spark, 2_000, 150, seed=22).withColumn(
        "url", F.concat(F.lit("s2-"), F.col("url"))
    ).withColumn("lsn", F.col("lsn") + 1_000_000).write.parquet(log2_dir)

    log1 = spark.read.parquet(log1_dir)
    log2 = spark.read.parquet(log2_dir)
    schema = T.StructType(
        [f for f in log1.schema.fields if f.name not in ("lsn", "op", "schema_version")]
    )
    table = LakeTable.create(str(tmp_path / "t"), schema, n_buckets=8)

    q1 = stream_replay(spark, log1_dir, table,
                       checkpoint_dir=str(tmp_path / "ck1"),
                       max_files_per_trigger=4)
    q1.awaitTermination(300)
    q2 = stream_replay(spark, log2_dir, table,
                       checkpoint_dir=str(tmp_path / "ck2"),
                       max_files_per_trigger=4)
    q2.awaitTermination(300)

    cols = ["url", "warc_ts", "html", "text", "lang", "text_encoding"]
    expected = generator.expected_final_state(log1).select(*cols).unionByName(
        generator.expected_final_state(log2).select(*cols)
    )
    assert_same_state(table.read(spark), expected, cols)
    # channel watermarks: one bounded entry per stream, no applied-id growth
    m = table.manifest()
    assert len([k for k in m.checkpoint if k.startswith("channel_seq:")]) == 2
    assert len(m.applied_batches) == 0


# ------------------------------------------- simhash / winnow / lsh / ann

def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_simhash_hamming_finds_perturbed_near_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 100)
    perturbed = docs.select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    pairs = dedup_docs.simhash_hamming_pairs(
        docs.unionByName(perturbed), shingle_n=2, bands=16, max_hamming=12
    )
    found = {(r.left_id, r.right_id) for r in pairs.collect()}
    planted = {(i, i + 5000) for i in range(100)}
    hit = len(found & planted) / len(planted)
    # one appended token flips few of 64 bits; banded search must recover
    # the bulk of the planted pairs (exact-dup recall is the oracle-gated
    # hamming-0 case; this pins near-dup behavior)
    assert hit >= 0.8, f"recall {hit}"


def test_simhash_banding_guard(spark):
    # pigeonhole recall guarantee requires max_hamming < bands
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dedup_docs.simhash_hamming_pairs(docs, bands=4, max_hamming=4)


def test_winnow_fingerprints_properties(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 60)
    dup = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    extended = docs.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail words appended here")).alias("text"),
    )
    fps = textops.winnow_fingerprints(
        docs.unionByName(dup).unionByName(extended), k=4, window=3
    )
    base = {r["doc_id"]: set(r["fingerprints"]) for r in fps.collect()}
    for i in range(60):
        assert base[i] == base[i + 1000]                 # identical docs
        inter = len(base[i] & base[i + 2000])
        union = len(base[i] | base[i + 2000])
        assert inter / union > 0.5                       # extension overlaps
    # unrelated docs share almost nothing
    j01 = len(base[0] & base[1]) / len(base[0] | base[1])
    assert j01 < 0.3


def test_lsh_bucket_stats_surface_dropped_buckets(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    big = docs.unionByName(
        docs.select((F.col("doc_id") + 9000).alias("doc_id"), "text")
    )
    stats = dedup_docs.lsh_bucket_stats(
        big, num_hashes=16, bands=4, shingle_n=3, max_bucket_size=1
    ).agg(
        F.sum("n_oversize_buckets").alias("ob"),
        F.sum("rows_in_oversize").alias("ro"),
    ).collect()[0]
    # every duplicated doc pair lands a ≥2 bucket — the guard's drops are
    # visible, not silent
    assert stats["ob"] > 0 and stats["ro"] >= 2 * stats["ob"]


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """Machinery correctness: probing every cell must reproduce the exact
    top-k (assignment + cell join + scoring introduce no error)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = sorted((r.query_id, r.vec_id, r.rnk)
                for r in similarity.brute_force_topk(emb, queries, k=5).collect())
    ivf = sorted((r.query_id, r.vec_id, r.rnk)
                 for r in similarity.ivf_topk(
                     emb, queries, dim=64, k=5, n_cells=8, n_probe=8).collect())
    assert ivf == bf


def test_ivf_prunes_and_finds_planted_clusters(spark, sf_dir):
    """Pruning correctness on clustered data: planted near-neighbors live in
    the query's own cell, so 2-of-8 probing still achieves recall 1.0."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = (
        emb.where(F.col("vec_id") < 3)
        .crossJoin(spark.range(1, 6).select(F.col("id").alias("j")))
        .select(
            (F.lit(100000) + F.col("vec_id") * 10 + F.col("j")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.02) * F.col("j")
            ).alias("embedding"),
        )
    )
    fixture = emb.unionByName(planted)
    queries = fixture.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r.query_id, r.vec_id)
          for r in similarity.brute_force_topk(fixture, queries, k=5).collect()}
    ivf = {(r.query_id, r.vec_id)
           for r in similarity.ivf_topk(
               fixture, queries, dim=64, k=5, n_cells=8, n_probe=2).collect()}
    assert ivf == bf


def test_multimodal_resize_and_frame_sample_contracts(spark):
    from embulk_input_marketo_spark.functions.multimodal import (
        resize_images, sample_video_frames,
    )

    docs = spark.createDataFrame(
        [(1, b"abcdefghij" * 5), (2, b"xy"), (3, None)],
        "doc_id long, payload binary",
    )
    rz = {r["doc_id"]: r for r in
          resize_images(docs, "payload", target_w=8, target_h=4).collect()}
    assert len(rz[1]["payload"]) == 32 and rz[1]["width"] == 8
    assert bytes(rz[2]["payload"]) == (b"xy" * 17)[:32]  # tiled to size
    assert rz[3]["payload"] is None                       # null passthrough

    fr = sample_video_frames(docs, "payload", every_n=10, max_frames=3).collect()
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    assert len(by_doc[1]) == 3                            # capped at max_frames
    assert by_doc[1][0] == (0, b"abcdefghij")
    assert len(by_doc[2]) == 1 and by_doc[2][0] == (0, b"xy")
    assert 3 not in by_doc                                # null rows emit nothing

    with pytest.raises(Exception):
        resize_images(docs, "payload", deterministic_fake=False).collect()


def test_ann_recall_against_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r.query_id, r.vec_id)
          for r in similarity.brute_force_topk(emb, queries, k=5).collect()}
    ann = {(r.query_id, r.vec_id)
           for r in similarity.ann_topk(
               emb, queries, dim=64, k=5, n_planes=6, n_tables=8,
               probe_bits=2).collect()}
    recall = len(ann & bf) / len(bf)
    assert recall >= 0.9, f"recall {recall}"
