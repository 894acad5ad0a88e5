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


def test_update_equals_union_build_plus_tombstones(spark, tmp_path, corpus):
    """update_documents ≡ one-shot build over the union corpus (old docs +
    updated versions under the same new ids) with the old ids tombstoned —
    rank AND score identity on every query path (VERDICT r4 item 7)."""
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.docids import assign_doc_ids
    from rdf_indexer_spark.index.maintain import update_documents
    from rdf_indexer_spark.index.build import build_index

    a, _ = corpus  # ids 0..159
    upd = [(5, "alpha beta refreshed needle prose"),
           (41, "the the gamma refreshed"),
           (100, "w1 w2 w3 refreshed needle")]

    idx = str(tmp_path / "upd")
    build_index(spark, spark.createDataFrame(a, ["doc_id", "text"]),
                idx, num_buckets=3, resume=False)
    update_documents(
        spark, spark.createDataFrame(upd, ["doc_id", "text"]), idx,
        num_buckets=2)

    # reference: same new-id assignment (deterministic), union build,
    # tombstone the replaced ids
    from rdf_indexer_spark.index.maintain import delete_docs
    mapping = {
        r["_old_id"]: 160 + r["_new_id"]
        for r in assign_doc_ids(
            spark.createDataFrame(upd, ["_old_id", "text"]),
            ["_old_id"], out_col="_new_id").collect()
    }
    union = a + [(mapping[i], t) for i, t in upd]
    ref = str(tmp_path / "ref")
    build_index(spark, spark.createDataFrame(union, ["doc_id", "text"]),
                ref, num_buckets=3, resume=False)
    delete_docs(spark, ref, [i for i, _ in upd])

    r_upd, r_ref = IndexReader(spark, idx), IndexReader(spark, ref)
    assert r_upd.n_docs == r_ref.n_docs == 163
    assert r_upd.avgdl == pytest.approx(r_ref.avgdl, rel=1e-12)
    for q in QUERIES + ["refreshed", "refreshed needle"]:
        w = r_upd.search_wand(q, 25)
        assert w == r_ref.search_wand(q, 25), q
        assert w == r_upd.search_wand_distributed(q, 25), q
        ex = [(r["doc_id"], r["score"])
              for r in r_upd.score_exhaustive(q, 25).collect()]
        assert [d for d, _ in ex] == [d for d, _ in w]
        for (d1, s1), (d2, s2) in zip(ex, w):
            assert s1 == pytest.approx(s2, rel=1e-12)
    # old versions are gone on every path; new content is served
    old_ids = {i for i, _ in upd}
    for q in ("refreshed", "needle"):
        assert not old_ids & {d for d, _ in r_upd.search_wand(q, 163)}
    assert {d for d, _ in r_upd.search_wand("refreshed", 10)} == set(
        mapping.values())

    # SQL surface sees the update too
    from rdf_indexer_spark.index.sqlsurface import register_sql_surface
    register_sql_surface(spark, idx)
    got = [(r["doc_id"], r["score"]) for r in
           spark.sql("SELECT * FROM bm25_search('refreshed', 10)").collect()]
    assert got == r_upd.search_wand("refreshed", 10)


def test_update_validates_ids(spark, tmp_path, corpus):
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import update_documents

    a, _ = corpus
    idx = str(tmp_path / "updbad")
    build_index(spark, spark.createDataFrame(a[:40], ["doc_id", "text"]),
                idx, num_buckets=2, resume=False)
    with pytest.raises(ValueError, match="unknown doc_id"):
        update_documents(
            spark, spark.createDataFrame([(999, "x")], ["doc_id", "text"]),
            idx)
    with pytest.raises(ValueError, match="duplicate"):
        update_documents(
            spark,
            spark.createDataFrame([(3, "x"), (3, "y")], ["doc_id", "text"]),
            idx)


def test_chained_update_of_updated_doc(spark, tmp_path, corpus):
    """Updating a doc whose current version itself came from an update:
    the second update targets the NEW id; both stale versions stay
    tombstoned and only the final text is served."""
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import update_documents

    a, _ = corpus
    idx = str(tmp_path / "chain")
    build_index(spark, spark.createDataFrame(a[:50], ["doc_id", "text"]),
                idx, num_buckets=2, resume=False)
    update_documents(
        spark, spark.createDataFrame([(7, "version two unique7")],
                                     ["doc_id", "text"]), idx, num_buckets=1)
    r = IndexReader(spark, idx)
    (v2_id, _), = r.search_wand("unique7", 5)
    assert v2_id == 50
    update_documents(
        spark, spark.createDataFrame([(v2_id, "version three unique7")],
                                     ["doc_id", "text"]), idx, num_buckets=1)
    r = IndexReader(spark, idx)
    hits = r.search_wand("unique7", 5)
    assert [d for d, _ in hits] == [51]
    assert sorted(r.tombstones) == [7, 50]
    assert r.search_wand_distributed("unique7", 5) == hits


def test_append_keeps_positional_index_positional(spark, tmp_path, corpus):
    """append_documents auto-detects a positional index (real pos_bin
    payloads) and writes appended buckets positionally — phrase queries
    over the grown index ≡ a one-shot positional build over the union,
    and planted phrases in the APPENDED docs are found."""
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import append_documents

    a, b = corpus
    # plant the phrase in docs from BOTH sides so hits must span the append
    a = [(i, t + " alpha beta gamma") if i % 37 == 0 else (i, t)
         for i, t in a]
    b = [(i, t + " alpha beta gamma") if i % 37 == 0 else (i, t)
         for i, t in b]

    one_shot = str(tmp_path / "oneshot_pos")
    build_index(spark, spark.createDataFrame(a + b, ["doc_id", "text"]),
                one_shot, num_buckets=3, resume=False, positions=True)

    incremental = str(tmp_path / "incr_pos")
    build_index(spark, spark.createDataFrame(a, ["doc_id", "text"]),
                incremental, num_buckets=3, resume=False, positions=True)
    append_documents(spark, spark.createDataFrame(b, ["doc_id", "text"]),
                     incremental, num_buckets=2)

    r1, r2 = IndexReader(spark, one_shot), IndexReader(spark, incremental)
    for phrase in ("alpha beta", "beta gamma", "alpha beta gamma"):
        w1 = r1.search_phrase(phrase, 10_000)
        w2 = r2.search_phrase(phrase, 10_000)
        assert [d for d, _ in w1] == [d for d, _ in w2], phrase
        for (d1, s1), (d2, s2) in zip(w1, w2):
            assert s1 == pytest.approx(s2, rel=1e-12)
        assert any(d >= 160 for d, _ in w2), f"{phrase}: no appended hit"
    # bag-of-words append onto a bag-of-words index stays flat (no
    # accidental positional flip) — and phrase queries refuse cleanly
    flat = str(tmp_path / "flat")
    build_index(spark, spark.createDataFrame(a, ["doc_id", "text"]),
                flat, num_buckets=2, resume=False)
    append_documents(spark, spark.createDataFrame(b, ["doc_id", "text"]),
                     flat, num_buckets=2)
    with pytest.raises(ValueError, match="positional"):
        IndexReader(spark, flat).search_phrase("alpha beta", 5)


def test_compact_equals_visible_corpus_build(spark, tmp_path, corpus):
    """compact_index (Lucene expungeDeletes) makes the index IDENTICAL on
    every query path to a one-shot build over the visible corpus — the
    stats-staleness window of the tombstone posture is closed: N, avgdl,
    df, and therefore the scores themselves, match a fresh build."""
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import compact_index, delete_docs

    a, b = corpus
    full = a + b
    victims = [i for i, _ in full if i % 7 == 3]
    survivors = [(i, t) for i, t in full if i % 7 != 3]

    idx = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(full, ["doc_id", "text"]),
                idx, num_buckets=3, resume=False)
    delete_docs(spark, idx, victims)

    # BEFORE compaction: deleted docs hidden but still inside the stats
    pre = IndexReader(spark, idx)
    assert pre.n_docs == len(full)

    compact_index(spark, idx)

    ref_dir = str(tmp_path / "ref")
    build_index(spark, spark.createDataFrame(survivors, ["doc_id", "text"]),
                ref_dir, num_buckets=3, resume=False)

    r_cmp, r_ref = IndexReader(spark, idx), IndexReader(spark, ref_dir)
    assert r_cmp.n_docs == r_ref.n_docs == len(survivors)
    assert r_cmp.avgdl == pytest.approx(r_ref.avgdl, rel=1e-12)
    assert len(r_cmp.tombstones) == 0
    for q in QUERIES:
        w1, w2 = r_cmp.search_wand(q, 50), r_ref.search_wand(q, 50)
        assert [d for d, _ in w1] == [d for d, _ in w2], q
        for (d1, s1), (d2, s2) in zip(w1, w2):
            assert s1 == pytest.approx(s2, rel=1e-12)
        assert r_cmp.search_wand_distributed(q, 50) == w1, q
    ex = [(r["doc_id"], round(r["score"], 9))
          for r in r_cmp.score_exhaustive("alpha beta gamma", 20).collect()]
    ex_ref = [(r["doc_id"], round(r["score"], 9))
              for r in r_ref.score_exhaustive("alpha beta gamma", 20).collect()]
    assert ex == ex_ref
    # compaction is idempotent (no tombstones left -> no-op)
    compact_index(spark, idx)
    assert IndexReader(spark, idx).search_wand("needle", 10) == \
        r_ref.search_wand("needle", 10)


def test_compact_preserves_positional(spark, tmp_path):
    """Compaction over a positional index keeps phrase capability: the
    compacted index's phrase results equal a fresh positional build over
    the visible corpus, on the driver AND distributed walks."""
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import compact_index, delete_docs

    docs = [(i, f"alpha beta w{i % 11} gamma " + ("alpha beta " * (i % 3)))
            for i in range(90)]
    victims = [i for i in range(90) if i % 5 == 1]
    survivors = [(i, t) for i, t in docs if i % 5 != 1]

    idx = str(tmp_path / "pidx")
    build_index(spark, spark.createDataFrame(docs, ["doc_id", "text"]),
                idx, num_buckets=2, resume=False, positions=True)
    delete_docs(spark, idx, victims)
    compact_index(spark, idx)

    ref_dir = str(tmp_path / "pref")
    build_index(spark, spark.createDataFrame(survivors, ["doc_id", "text"]),
                ref_dir, num_buckets=2, resume=False, positions=True)

    r_cmp, r_ref = IndexReader(spark, idx), IndexReader(spark, ref_dir)
    for phrase in ("alpha beta", "beta alpha", "alpha beta alpha"):
        w1 = r_cmp.search_phrase(phrase, 100, distributed=False)
        w2 = r_ref.search_phrase(phrase, 100, distributed=False)
        assert [d for d, _ in w1] == [d for d, _ in w2], phrase
        for (d1, s1), (d2, s2) in zip(w1, w2):
            assert s1 == pytest.approx(s2, rel=1e-12)
        assert r_cmp.search_phrase_distributed(phrase, 100) == w1, phrase
    assert r_cmp.search_phrase("alpha beta", 1000, distributed=False)


def test_compact_refuses_to_empty_the_index(spark, tmp_path):
    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.maintain import compact_index, delete_docs

    idx = str(tmp_path / "small")
    build_index(spark, spark.createDataFrame(
        [(0, "only doc")], ["doc_id", "text"]), idx, num_buckets=1,
        resume=False)
    delete_docs(spark, idx, [0])
    with pytest.raises(ValueError, match="empty"):
        compact_index(spark, idx)
