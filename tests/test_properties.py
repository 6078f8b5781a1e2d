"""Property-based invariants (hypothesis) over randomized inputs — the
engine's core guarantees must hold for ARBITRARY changelogs, not just the
fixtures:

- slice invariance: the replayed final state is identical whatever batch
  span the window is sliced into, and equals an independent python LWW;
- hot-key split sessionization is row-identical to the plain operator for
  random event sets and any legal (gap, split) pair;
- the ACCEPT stray-quote parser agrees with a pure-python reference
  tokenizer on random field contents.

Examples are few (Spark jobs are seconds each) but adversarial: hypothesis
shrinks any failure to a minimal changelog.
"""

import datetime
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)

EPOCH = datetime.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 7),                 # key
        st.integers(0, 120),               # ts offset (sec) — ties likely
        st.sampled_from(["I", "U", "D"]),  # op
        st.integers(-50, 50),              # value
    ),
    min_size=1,
    max_size=60,
)


def _changelog_df(spark, events):
    rows = [
        (i, op, str(k), EPOCH + datetime.timedelta(seconds=ts), float(v))
        for i, (k, ts, op, v) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "lsn long, op string, url string, warc_ts timestamp, value double"
    )


def _python_lww(events):
    """Independent reference: per key, winner by (ts, lsn); drop deletes."""
    best = {}
    for i, (k, ts, op, v) in enumerate(events):
        key = str(k)
        cand = (ts, i, op, float(v))
        if key not in best or cand[:2] > best[key][:2]:
            best[key] = cand
    return sorted(
        (k, EPOCH + datetime.timedelta(seconds=ts), v)
        for k, (ts, _, op, v) in best.items()
        if op != "D"
    )


@given(events=events_strategy, span=st.sampled_from([3, 17, 1000]))
@settings(**SETTINGS)
def test_replay_final_state_is_slice_invariant(spark, tmp_path_factory, events, span):
    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.replay import replay

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(dir=str(tmp_path_factory.getbasetemp()))
    table = LakeTable.create(
        os.path.join(work, "t"), schema, key_col="url",
        lww_major="warc_ts", n_buckets=4,
    )
    log = _changelog_df(spark, events)
    replay(spark, log, table, batch_span=span, compact_threshold=3)
    got = sorted(
        (r["url"], r["warc_ts"], r["value"])
        for r in table.read(spark).collect()
    )
    assert got == _python_lww(events)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 400)),
        min_size=1, max_size=50,
    ),
    gap=st.integers(1, 30),
    extra=st.integers(0, 40),
)
@settings(**SETTINGS)
def test_sessionize_split_row_identical_for_random_inputs(spark, events, gap, extra):
    from embulk_input_marketo_spark.operators.temporal import (
        sessionize, sessionize_split,
    )

    df = spark.createDataFrame(
        [
            (str(k), EPOCH + datetime.timedelta(seconds=ts), i)
            for i, (k, ts) in enumerate(events)
        ],
        "user_id string, ts timestamp, event_id long",
    )
    plain = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["session_seq"])
        for r in sessionize(
            df, "user_id", "ts", gap_sec=gap, order_tiebreak="event_id"
        ).collect()
    )
    split = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["session_seq"])
        for r in sessionize_split(
            df, "user_id", "ts", gap_sec=gap, split_every_sec=gap + extra,
            order_tiebreak="event_id",
        ).collect()
    )
    assert plain == split


_field = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters=',\r\n',
        exclude_categories=("Cc",),
    ),
    max_size=12,
)


@given(rows=st.lists(st.tuples(_field, _field, _field), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_accept_stray_quotes_matches_python_reference(
    spark, tmp_path_factory, rows
):
    from embulk_input_marketo_spark.sources.csv_source import (
        _accept_field, accept_stray_quotes,
    )

    work = tempfile.mkdtemp(dir=str(tmp_path_factory.getbasetemp()))
    path = os.path.join(work, "f.csv")
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(r) + "\n")

    nullsafe = lambda row: tuple(  # noqa: E731
        (v is None, v or "") for v in row
    )
    expected = sorted(
        (tuple(_accept_field(tok, '"', "null") for tok in r) for r in rows),
        key=nullsafe,
    )
    got = sorted(
        (
            (r["a"], r["b"], r["c"])
            for r in accept_stray_quotes(
                spark, path, columns=["a", "b", "c"], header=False
            ).collect()
        ),
        key=nullsafe,
    )
    assert got == expected


# ---------------------------------------------------------------------------
# stateful lake invariant: random interleavings of merge / evolve_schema /
# compact / expire against a driver-side reference model — the manifest
# chain (delta pointers, schema history, rename tombstones, expiry) must
# never lose or invent state, whatever the operation order.
# ---------------------------------------------------------------------------

_lake_ops = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.lists(
            st.tuples(
                st.integers(0, 5),                 # key
                st.integers(0, 200),               # ts offset
                st.sampled_from(["U", "U", "D"]),  # op (updates dominate)
                st.integers(-30, 30),              # value
            ),
            min_size=1, max_size=10,
        )),
        st.tuples(st.just("add"), st.none()),
        st.tuples(st.just("drop"), st.none()),
        st.tuples(st.just("compact"), st.integers(0, 3)),
        st.tuples(st.just("expire"), st.none()),
    ),
    min_size=2, max_size=8,
)


@given(ops=_lake_ops)
@settings(**SETTINGS)
def test_lake_random_op_interleavings_match_model(
    spark, tmp_path_factory, ops
):
    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.merge import (
        compact_buckets, merge_batch,
    )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(dir=str(tmp_path_factory.getbasetemp()))
    table = LakeTable.create(
        os.path.join(work, "t"), schema, key_col="url",
        lww_major="warc_ts", n_buckets=4,
    )

    # reference model: per key the LWW winner, remembering whether 'extra'
    # was in the schema when the winner was written and how many drops of
    # 'extra' happened after (a later drop tombstones the value for good,
    # and a re-add reads NULL from pre-drop files)
    best: dict = {}          # key -> (ts, lsn, op, value, extra, gen)
    has_extra = False
    extra_generation = 0      # bumped on every re-add after a drop
    lsn = 0

    for kind, arg in ops:
        if kind == "merge":
            lsn_base = lsn
            rows = []
            for j, (k, ts, op, v) in enumerate(arg):
                ts_dt = EPOCH + datetime.timedelta(seconds=ts)
                ev_lsn = lsn_base + j
                row = {
                    "url": str(k), "warc_ts": ts_dt,
                    "value": float(v), "op": op, "lsn": ev_lsn,
                }
                if has_extra:
                    row["extra"] = float(v) * 2
                rows.append(row)
                key = str(k)
                cand = (ts, ev_lsn)
                if key not in best or cand > best[key][:2]:
                    best[key] = (
                        ts, ev_lsn, op, float(v),
                        float(v) * 2 if has_extra else None,
                        extra_generation if has_extra else -1,
                    )
            lsn += len(arg)
            cols = "url string, warc_ts timestamp, value double, " + (
                "extra double, " if has_extra else ""
            ) + "op string, lsn long"
            batch = spark.createDataFrame(
                [tuple(r[c] for c in
                       [f.split()[0] for f in cols.split(", ")])
                 for r in rows],
                cols,
            )
            merge_batch(
                spark, table, batch, batch_id=f"b{lsn}", lsn_col="lsn",
                checkpoint={"hwm_lsn": lsn - 1},
            )
        elif kind == "add":
            if not has_extra:
                table.evolve_schema(
                    [{"change": "add", "name": "extra", "type": "double"}]
                )
                has_extra = True
                extra_generation += 1
        elif kind == "drop":
            if has_extra:
                table.evolve_schema([{"change": "drop", "name": "extra"}])
                has_extra = False
        elif kind == "compact":
            buckets = sorted(int(b) for b in set(table.manifest().files))
            if buckets:
                compact_buckets(spark, table, buckets[arg % len(buckets):])
        elif kind == "expire":
            table.expire_snapshots(keep_last=2, spark=spark)

    # final state must equal the model under the current schema
    cur_cols = [f.name for f in table.manifest().current_schema().fields]
    got = sorted(
        tuple(r[c] for c in cur_cols)
        for r in table.read(spark).collect()
    )
    expected = []
    for key, (ts, _l, op, v, extra, gen) in best.items():
        if op == "D":
            continue
        row = {
            "url": key,
            "warc_ts": EPOCH + datetime.timedelta(seconds=ts),
            "value": v,
        }
        if "extra" in cur_cols:
            # visible only if written under the CURRENT add-generation of
            # the column (any intervening drop tombstones old values)
            row["extra"] = extra if gen == extra_generation else None
        expected.append(tuple(row[c] for c in cur_cols))
    assert got == sorted(expected)

    # every retained snapshot stays readable (manifest chain integrity)
    for m in table.history():
        table.read(spark, version=m.version).collect()


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=80,
                 unique=True),
    n_strata=st.integers(1, 4),
    k=st.integers(1, 12),
    seed=st.integers(0, 3),
)
@settings(**SETTINGS)
def test_sampler_invariants_for_random_corpora(spark, ids, n_strata, k, seed):
    """For arbitrary corpora: sample_k_per_stratum returns exactly
    min(k, |stratum|) rows per stratum with contiguous ranks, is monotone
    in k, and matches a pure-python reference over the same md5 draw;
    assign_split is a total function whose bands match the same draw."""
    import hashlib

    from embulk_input_marketo_spark.operators.sampling import (
        assign_split,
        sample_k_per_stratum,
    )

    rows = [(i, f"s{i % n_strata}") for i in ids]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])

    def draw(i):
        h = hashlib.md5(f"{i}|{seed}".encode()).hexdigest()
        return int(h[:8], 16)

    got = sample_k_per_stratum(
        df, "lang", k=k, key_col="doc_id", seed=seed, n_buckets=8
    ).collect()
    by_stratum: dict = {}
    for r in got:
        by_stratum.setdefault(r["lang"], []).append(
            (r["sample_rank"], r["doc_id"])
        )
    for s in {f"s{i % n_strata}" for i in ids}:
        members = sorted(
            (draw(i), i) for i in ids if f"s{i % n_strata}" == s
        )
        want = [i for _, i in members[:k]]
        picked = sorted(by_stratum.get(s, []))
        assert [r for r, _ in picked] == list(range(1, len(want) + 1))
        assert [d for _, d in picked] == want

    if k > 1:  # monotone: the (k-1)-sample is a prefix of the k-sample
        smaller = {
            (r["lang"], r["doc_id"])
            for r in sample_k_per_stratum(
                df, "lang", k=k - 1, key_col="doc_id", seed=seed, n_buckets=8
            ).collect()
        }
        assert smaller <= {(r["lang"], r["doc_id"]) for r in got}

    split = assign_split(
        df, {"train": 0.75, "valid": 0.125, "test": 0.125},
        key_col="doc_id", seed=seed,
    ).collect()
    assert len(split) == len(ids)
    for r in split:
        d = draw(r["doc_id"]) / 2**32
        want = "train" if d < 0.75 else "valid" if d < 0.875 else "test"
        assert r["split"] == want


# ---------------------------------------------------------------------------
# stateful CDF/follower invariant (r4 VERDICT item 9): random interleavings
# of merge / delete_where / compact / restore with follower maintains — the
# signed-delta rollup must equal a full recompute of the current table state
# after EVERY maintain, whatever landed in between.
# ---------------------------------------------------------------------------

_feed_ops = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.lists(
            st.tuples(
                st.integers(0, 5),                 # key
                st.integers(0, 200),               # ts offset
                st.sampled_from(["U", "U", "D"]),  # op
                st.integers(0, 30),                # value (nonneg: floor-safe)
            ),
            min_size=1, max_size=8,
        )),
        st.tuples(st.just("delete"), st.integers(0, 30)),
        st.tuples(st.just("compact"), st.integers(0, 3)),
        st.tuples(st.just("restore"), st.integers(0, 6)),
        st.tuples(st.just("maintain"), st.none()),
    ),
    min_size=3, max_size=10,
).filter(lambda ops: any(k == "maintain" for k, _ in ops))


@given(ops=_feed_ops)
@settings(**SETTINGS)
def test_follower_rollup_matches_recompute_under_random_ops(
    spark, tmp_path_factory, ops
):
    from embulk_input_marketo_spark.lake import LakeTable
    from embulk_input_marketo_spark.lake.follow import ChangeFeedFollower
    from embulk_input_marketo_spark.lake.merge import (
        compact_buckets, delete_where, merge_batch,
    )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(dir=str(tmp_path_factory.getbasetemp()))
    table = LakeTable.create(
        os.path.join(work, "t"), schema, key_col="url",
        lww_major="warc_ts", n_buckets=4,
    )
    follower = ChangeFeedFollower(
        table,
        os.path.join(work, "state"),
        group_exprs=[(F.col("url").cast("long") % 2).alias("grp")],
        group_names=["grp"],
        measure=F.floor(F.col("value")).cast("long"),
    )

    def recompute():
        return {
            (r["grp"], r["n"], r["s"])
            for r in table.read(spark)
            .groupBy((F.col("url").cast("long") % 2).alias("grp"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.floor(F.col("value")).cast("long")).alias("s"),
            )
            .collect()
        }

    def rollup():
        return {
            (r["grp"], r["n_rows"], r["vsum"])
            for r in follower.rollup(spark).collect()
        }

    lsn = 0
    maintained = False
    for kind, arg in ops:
        if kind == "merge":
            rows = [
                (str(k), EPOCH + datetime.timedelta(seconds=ts), float(v),
                 op, lsn + j)
                for j, (k, ts, op, v) in enumerate(arg)
            ]
            lsn += len(arg)
            merge_batch(
                spark, table,
                spark.createDataFrame(
                    rows,
                    "url string, warc_ts timestamp, value double,"
                    " op string, lsn long",
                ),
                batch_id=f"b{lsn}", lsn_col="lsn",
            )
        elif kind == "delete":
            delete_where(spark, table, F.col("value") >= float(arg))
        elif kind == "compact":
            buckets = sorted(int(b) for b in set(table.manifest().files))
            if buckets:
                compact_buckets(spark, table, buckets[arg % len(buckets):])
        elif kind == "restore":
            versions = [m.version for m in table.history()]
            target = versions[arg % len(versions)]
            if target < table.current_version():
                table.restore(target)
        elif kind == "maintain":
            follower.maintain(spark)
            maintained = True
            assert rollup() == recompute()

    # the run must end caught-up and still exact
    follower.maintain(spark)
    assert rollup() == recompute()
    assert maintained
    assert follower.poll(spark) is None
