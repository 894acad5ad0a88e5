"""Index maintenance: incremental append ≡ one-shot build (rank + score
identity) and tombstone deletes (Lucene visibility semantics) on all three
query paths."""

import numpy as np
import pytest

QUERIES = ["needle", "the", "alpha beta gamma", "w1 w2"]


def _synth(n, offset=0, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(300)] + ["the", "alpha", "beta", "gamma"]
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    rows = []
    for i in range(n):
        ln = int(rng.integers(20, 150))
        text = " ".join(rng.choice(vocab, size=ln, p=weights))
        if (i + offset) % 41 == 0:
            text += " needle"
        rows.append((i + offset, text))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    a = _synth(160)                       # initial corpus: ids 0..159
    b = [(i + 160, t) for i, t in
         ((j, t) for j, t in _synth(80, seed=11))]  # appended: ids 160..239
    return a, b


def test_append_equals_one_shot(spark, tmp_path, corpus):
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import append_documents

    a, b = corpus
    one_shot = str(tmp_path / "oneshot")
    build_index(spark, spark.createDataFrame(a + b, ["doc_id", "text"]),
                one_shot, num_buckets=3, resume=False)

    incremental = str(tmp_path / "incr")
    build_index(spark, spark.createDataFrame(a, ["doc_id", "text"]),
                incremental, num_buckets=3, resume=False)
    append_documents(spark, spark.createDataFrame(b, ["doc_id", "text"]),
                     incremental, num_buckets=2)

    r1, r2 = IndexReader(spark, one_shot), IndexReader(spark, incremental)
    assert r1.n_docs == r2.n_docs == 240
    assert r1.avgdl == r2.avgdl                       # stats combine exactly
    for q in QUERIES:
        assert r1.search_wand(q, 25) == r2.search_wand(q, 25), q
        assert r2.search_wand(q, 25) == r2.search_wand_distributed(q, 25), q


def test_append_requires_dense_continuation(spark, tmp_path, corpus):
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import append_documents

    a, _ = corpus
    idx = str(tmp_path / "gap")
    build_index(spark, spark.createDataFrame(a, ["doc_id", "text"]),
                idx, num_buckets=2, resume=False)
    bad = spark.createDataFrame([(500, "gap doc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="dense"):
        append_documents(spark, bad, idx)


def test_tombstone_delete_all_paths(spark, tmp_path, corpus):
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import delete_docs

    a, _ = corpus
    idx = str(tmp_path / "del")
    build_index(spark, spark.createDataFrame(a, ["doc_id", "text"]),
                idx, num_buckets=3, resume=False)
    before = IndexReader(spark, idx)
    hits = before.search_wand("needle", 10)
    assert len(hits) >= 2
    victim = hits[0][0]

    delete_docs(spark, idx, [victim])
    after = IndexReader(spark, idx)
    assert list(after.tombstones) == [victim]

    # Lucene semantics: the deleted doc disappears; every OTHER doc keeps
    # its pre-delete score (stats still count the deleted doc until rebuild)
    new_hits = after.search_wand("needle", 10)
    assert victim not in [d for d, _ in new_hits]
    old_rest = [(d, s) for d, s in hits if d != victim]
    assert new_hits[: len(old_rest)] == old_rest

    # the three paths agree with each other post-delete
    dist = after.search_wand_distributed("needle", 10)
    assert dist == new_hits
    ex = [(r["doc_id"], r["score"])
          for r in after.score_exhaustive("needle", 10).collect()]
    assert [d for d, _ in ex] == [d for d, _ in new_hits]
    for (d1, s1), (d2, s2) in zip(ex, new_hits):
        assert s1 == pytest.approx(s2, rel=1e-12)


def test_delete_by_query_on_docstore(spark, tmp_path):
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import delete_by_query

    docs = spark.createDataFrame(
        [(i, f"shared tokens plus t{i}", "old" if i < 30 else "new")
         for i in range(60)],
        ["doc_id", "text", "batch"],
    )
    idx = str(tmp_path / "dbq")
    build_index(spark, docs, idx, num_buckets=2, resume=False,
                meta_cols=("batch",))
    n = delete_by_query(spark, idx, "batch = 'old'")
    assert n == 30
    reader = IndexReader(spark, idx)
    hits = reader.search_wand("shared", 60)
    assert all(d >= 30 for d, _ in hits)
    assert len(hits) == 30


def test_large_tombstone_set_broadcast_not_closure(spark, tmp_path):
    """10^5 tombstoned ids must NOT ride every task closure: the reader
    broadcasts the set once (bm25.IndexReader._tomb_bc) and the distributed
    walk's closure serializes to O(1) — plus the search stays correct."""
    import numpy as np
    from pyspark.serializers import CloudPickleSerializer

    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import delete_docs

    docs = spark.createDataFrame(
        [(i, f"needle common w{i % 7}") for i in range(80)],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "bigtomb")
    build_index(spark, docs, idx, num_buckets=2, resume=False)
    # tombstone 100k ids (most beyond the corpus — size is what matters)
    delete_docs(spark, idx, list(range(40, 100_040)))
    reader = IndexReader(spark, idx)
    assert len(reader.tombstones) == 100_000
    # the broadcast HANDLE pickles to O(1); the raw array is ~800 KB
    ser = CloudPickleSerializer()
    assert len(ser.dumps(reader._tomb_bc)) < 10_000
    assert reader.tombstones.nbytes >= 800_000
    # correctness through the executor-side path
    hits = reader.search_wand_distributed("needle", 50)
    assert hits == reader.search_wand("needle", 50)
    assert {d for d, _ in hits} == set(range(40))
    # ...and through the SQL surface (worker-side pyarrow tombstone load)
    from rdf_indexer_spark.index.sqlsurface import register_sql_surface

    register_sql_surface(spark, idx, name="bm25_search_tomb")
    sql_hits = [(r["doc_id"], r["score"]) for r in spark.sql(
        "SELECT * FROM bm25_search_tomb('needle', 50)").orderBy("rank").collect()]
    assert sql_hits == hits
