"""Incremental dedup against a persisted minhash index: the batch-over-batch
lifecycle the oracle query (one batch) can't see."""

from pyspark.sql import functions as F

from embulk_input_marketo_spark.operators import dedup_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "how vexingly quick daft zebras jump around the pen"),
]


def test_batch_flags_and_index_update(spark, tmp_path):
    idx = str(tmp_path / "idx")
    dedup_docs.write_minhash_index(_docs(spark, CORPUS), idx)

    batch1 = _docs(
        spark,
        [
            (10, CORPUS[0][1]),          # copy of corpus doc → dup_of_corpus
            (11, "a genuinely new document about distributed query engines"),
            (12, "duplicate pair inside the very same nightly batch here"),
            (13, "duplicate pair inside the very same nightly batch here"),
        ],
    )
    out = {
        r.doc_id: (r.dup_of_corpus, r.dup_in_batch, r.keep)
        for r in dedup_docs.incremental_dedup(
            batch1, idx, update_index=True
        ).collect()
    }
    assert out[10] == (True, False, False)
    assert out[11] == (False, False, True)
    assert out[12] == (False, False, True)   # bucket min survives
    assert out[13] == (False, True, False)

    # batch 2 must now dedup against batch 1's SURVIVORS via the index delta
    batch2 = _docs(
        spark,
        [
            (20, "a genuinely new document about distributed query engines"),
            (21, "completely fresh content that matches nothing at all ok"),
        ],
    )
    out2 = {
        r.doc_id: (r.dup_of_corpus, r.keep)
        for r in dedup_docs.incremental_dedup(batch2, idx).collect()
    }
    assert out2[20] == (True, False)  # dups batch 1's kept doc 11
    assert out2[21] == (False, True)


def test_dropped_batch_docs_never_enter_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    dedup_docs.write_minhash_index(_docs(spark, CORPUS), idx)
    batch1 = _docs(spark, [(10, CORPUS[0][1])])  # pure dup — nothing kept
    dedup_docs.incremental_dedup(batch1, idx, update_index=True)
    # the index holds only corpus signatures: a fresh doc still keeps, and
    # the dup's id never appears in the index rows
    index = dedup_docs._read_minhash_index(spark, idx)
    assert index.where(F.col("doc_id") == 10).count() == 0


def test_index_params_round_trip(spark, tmp_path):
    idx = str(tmp_path / "idx")
    dedup_docs.write_minhash_index(
        _docs(spark, CORPUS), idx, num_hashes=32, bands=8, shingle_n=3,
        seed=7,
    )
    p = dedup_docs._minhash_index_params(idx)
    assert (p["num_hashes"], p["bands"], p["shingle_n"], p["seed"]) == (
        32, 8, 3, 7,
    )
    # a batch deduped through the stored params still finds the exact copy
    out = dedup_docs.incremental_dedup(
        _docs(spark, [(10, CORPUS[1][1])]), idx
    ).collect()
    assert out[0].dup_of_corpus
