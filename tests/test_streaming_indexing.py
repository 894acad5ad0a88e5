"""Continuous indexing (streaming/indexing.py): a document stream committed
through foreachBatch + append_documents equals a batch build over the same
documents, on every query path — and a restarted stream resumes from its
checkpoint without double-indexing."""

import os
import time

import pytest


def _wait(q, timeout=120):
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(timeout)


def _docs(a, b):
    return [(i, f"alpha w{i % 13} beta gamma common t{i % 5}")
            for i in range(a, b)]


def test_stream_index_equals_batch_build(spark, tmp_path):
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.streaming.indexing import index_stream

    seed = _docs(0, 30)
    later = _docs(30, 75)

    idx = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(seed, ["doc_id", "text"]),
                idx, num_buckets=2, resume=False, positions=True)

    # file-source stream: drop the later docs as parquet files into a dir
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(t,) for _, t in later[:20]], "text string") \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(t,) for _, t in later[20:]], "text string") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("text string").parquet(src)
    q = index_stream(stream, idx, ck, num_buckets_per_batch=1,
                     trigger={"availableNow": True})
    _wait(q)

    ref = str(tmp_path / "ref")
    build_index(spark, spark.createDataFrame(seed + later,
                                             ["doc_id", "text"]),
                ref, num_buckets=2, resume=False, positions=True)

    r_s, r_b = IndexReader(spark, idx), IndexReader(spark, ref)
    assert r_s.n_docs == r_b.n_docs == 75
    assert r_s.avgdl == pytest.approx(r_b.avgdl, rel=1e-12)
    # ordering inside a micro-batch is arrival order, which for the file
    # source matches the file write order here — scores AND doc sets must
    # agree with the batch build on every path
    for qstr in ("alpha", "beta gamma", "t3 common"):
        w_s = r_s.search_wand(qstr, 100)
        w_b = r_b.search_wand(qstr, 100)
        assert {d for d, _ in w_s} == {d for d, _ in w_b}, qstr
        assert sorted(s for _, s in w_s) == pytest.approx(
            sorted(s for _, s in w_b)), qstr
        assert r_s.search_wand_distributed(qstr, 100) == w_s, qstr
    ph_s = r_s.search_phrase("beta gamma", 1000)
    ph_b = r_b.search_phrase("beta gamma", 1000)
    assert len(ph_s) == len(ph_b) == 75  # positional survived streaming
    assert sorted(s for _, s in ph_s) == pytest.approx(
        sorted(s for _, s in ph_b))


def test_stream_restart_does_not_double_index(spark, tmp_path):
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.streaming.indexing import index_stream

    idx = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(_docs(0, 10),
                                             ["doc_id", "text"]),
                idx, num_buckets=1, resume=False)
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ck = str(tmp_path / "ck")
    spark.createDataFrame([("zebra unique doc",)], "text string") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("text string").parquet(src)
    q = index_stream(stream, idx, ck, num_buckets_per_batch=1,
                     trigger={"availableNow": True})
    _wait(q)
    n1 = IndexReader(spark, idx).n_docs
    assert n1 == 11

    # restart over the SAME checkpoint with no new files: nothing happens
    stream2 = spark.readStream.schema("text string").parquet(src)
    q2 = index_stream(stream2, idx, ck, num_buckets_per_batch=1,
                      trigger={"availableNow": True})
    _wait(q2)
    r = IndexReader(spark, idx)
    assert r.n_docs == 11
    assert len(r.search_wand("zebra", 10)) == 1
