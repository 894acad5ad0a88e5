"""Training-data pipeline operators: pytest oracles for the Spark-only ops
(minhash/simhash/ngram-jaccard/fingerprints/langid)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


BASE = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the old wooden barn and the river keeps flowing "
        "toward the distant sea past quiet villages and green fields")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                                    # exact dup of 0
        (2, BASE.replace("wooden barn", "stone bridge")),             # near dup of 0
        (3, "completely different content about spark sql engines"),
        (4, "le chat est sur la table et il est content"),            # fr-ish
        (5, "der hund ist nicht mit der katze und das ist gut"),      # de-ish
        (6, BASE.replace("lazy dog", "lazy cat")),                    # near dup
        (7, "spark sql engines process completely different content"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, docs):
    from rdf_indexer_spark.textops import dedup_keep_canonical, exact_duplicates

    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2
    assert groups[0]["canonical_id"] == 0
    assert groups[0]["member_ids"] == [0, 1]

    kept = dedup_keep_canonical(docs)
    assert kept.count() == 7
    assert kept.filter(F.col("doc_id") == 1).count() == 0


def test_minhash_finds_near_dups(spark, docs):
    from rdf_indexer_spark.textops import minhash_near_duplicates

    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_near_duplicates(docs, jaccard_threshold=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0      # exact dup → all sigs equal
    assert any(p in pairs for p in [(0, 2), (1, 2)])     # near dup found
    assert (3, 4) not in pairs                            # unrelated not paired


def test_minhash_signature_deterministic(spark, docs):
    from rdf_indexer_spark.textops import minhash_signature_udf, tokens_col

    s1 = docs.select(minhash_signature_udf(tokens_col(F.col("text"))).alias("s")).collect()
    s2 = docs.select(minhash_signature_udf(tokens_col(F.col("text"))).alias("s")).collect()
    assert [r["s"] for r in s1] == [r["s"] for r in s2]


def test_simhash(spark, docs):
    from rdf_indexer_spark.textops import simhash_near_duplicates, with_simhash

    # identical text → identical simhash
    sh = with_simhash(docs).select("doc_id", "sh").collect()
    by_id = {r["doc_id"]: r["sh"] for r in sh}
    assert by_id[0] == by_id[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_duplicates(docs, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0
    # near-dup has small distance; unrelated docs differ more
    if (0, 2) in pairs:
        assert pairs[(0, 2)] <= 10


def test_ngram_jaccard(spark, docs):
    from rdf_indexer_spark.textops import ngram_jaccard

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], ["id_a", "id_b"]
    )
    j = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in ngram_jaccard(pairs, docs).collect()}
    assert j[(0, 1)] == 1.0
    assert 0.0 < j[(0, 2)] < 1.0
    assert j[(0, 3)] == 0.0


def test_language_id(spark, docs):
    from rdf_indexer_spark.textops import language_id

    out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert out[0] == "en"
    assert out[4] == "fr"
    assert out[5] == "de"


def test_quality_features(spark, docs):
    from rdf_indexer_spark.textops import quality_features

    small = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    row = quality_features(small).collect()[0]
    assert row["n_tokens"] == 9
    # stopword list hits: 'the' ×2 ('over' is not a function word here)
    assert row["stopword_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    assert row["unique_ratio"] == pytest.approx(8 / 9, abs=1e-6)
    assert row["punct_ratio"] == 0.0


def test_fingerprints_winnowing(spark, docs):
    from rdf_indexer_spark.textops import fingerprints

    fp = {r["doc_id"]: r["fingerprints"] for r in fingerprints(docs).collect()}
    assert fp[0] == fp[1]                      # identical docs, identical prints
    shared = set(fp[0]) & set(fp[2])
    assert shared                               # near dups share fingerprints
    assert not (set(fp[0]) & set(fp[3]))        # unrelated share none


def test_token_count_matches_python(spark, docs):
    from rdf_indexer_spark.analyzer import tokenize
    from rdf_indexer_spark.textops import token_count

    got = {r["doc_id"]: r["n"] for r in
           docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    for row in docs.collect():
        assert got[row["doc_id"]] == len(tokenize(row["text"]))


def test_hot_bucket_guards_degenerate_corpus(spark):
    """Skew guards: a degenerate corpus (hundreds of identical docs) must
    not send a quadratic bucket through the candidate join. With max_bucket
    below the clone count both operators drop the hot buckets (0 pairs);
    raising the cap re-admits them. Mirrors minhash's r1 guard; simhash
    gained the same guard in r2."""
    from pyspark.sql import functions as F  # noqa: F401

    from rdf_indexer_spark.textops import (
        minhash_near_duplicates, simhash_near_duplicates,
    )

    clones = [(i, "identical boilerplate text repeated everywhere always")
              for i in range(300)]
    df = spark.createDataFrame(clones, ["doc_id", "text"])

    # caps below the clone count: every bucket is hot -> dropped -> no pairs
    assert simhash_near_duplicates(df, max_hamming=8, max_bucket=200).count() == 0
    assert minhash_near_duplicates(df, jaccard_threshold=0.5, max_bucket=200).count() == 0

    # caps above: the pairs come back (guard only fires on pathology)
    n = 300 * 299 // 2
    assert simhash_near_duplicates(df, max_hamming=8, max_bucket=2000).count() == n
    assert minhash_near_duplicates(df, jaccard_threshold=0.5, max_bucket=2000).count() == n


def test_minhash_exact_recall_vs_ground_truth(spark):
    """LSH recall == 1 on the sandbox corpora at threshold 0.8: the engine's
    exact-verified pairs equal the brute-force all-pairs ground truth."""
    import os

    from pyspark.sql import functions as F

    from rdf_indexer_spark.textops import (
        minhash_near_duplicates_exact, ngram_jaccard,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        "doc_id", "text"
    )
    got = {(r["id_a"], r["id_b"])
           for r in minhash_near_duplicates_exact(docs, jaccard_threshold=0.8).collect()}
    # brute-force ground truth via the same exact-jaccard operator over ALL
    # pairs (no LSH) — recall AND precision must both be 1
    ids = docs.select(F.col("doc_id").alias("id_a"))
    all_pairs = ids.crossJoin(docs.select(F.col("doc_id").alias("id_b"))).filter(
        F.col("id_a") < F.col("id_b")
    )
    truth = {(r["id_a"], r["id_b"])
             for r in ngram_jaccard(all_pairs, docs, n=3).filter(
                 F.col("jaccard") >= 0.8).collect()}
    assert got == truth
    assert truth  # non-vacuous: planted near-dups exist


# --- curation operators: decontamination, PII, repetition (r5) -------------


def test_decontaminate_semantics(spark):
    from rdf_indexer_spark.textops import decontaminate

    mk = lambda i, words: (i, " ".join(words))
    base = [f"w{j}" for j in range(12)]          # 12 tokens → 5 8-grams
    docs = spark.createDataFrame([
        mk(0, base),                              # identical to benchmark
        mk(1, base[:8]),                          # shares exactly 1 8-gram
        mk(2, ["x"] * 12),                        # no overlap
        mk(3, ["short", "doc"]),                  # < n tokens: no grams
    ], ["doc_id", "text"])
    bench = spark.createDataFrame([mk(9, base)], ["doc_id", "text"])
    got = {r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
           for r in decontaminate(docs, bench, n=8).collect()}
    assert got == {0: (5, True), 1: (1, True), 2: (0, False), 3: (0, False)}
    # min_shared raises the bar
    got2 = {r["doc_id"]: r["contaminated"] for r in
            decontaminate(docs, bench, n=8, min_shared=2).collect()}
    assert got2 == {0: True, 1: False, 2: False, 3: False}
    # non-broadcast path is identical
    got3 = {r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
            for r in decontaminate(docs, bench, n=8,
                                   broadcast_benchmark=False).collect()}
    assert got3 == got


def test_pii_scan_semantics(spark):
    from rdf_indexer_spark.textops import pii_scan

    docs = spark.createDataFrame([
        (0, "reach me at a.b-c@mail.example.org or x@y.io thanks"),
        (1, "call +1 415-555-0100 or (020) 7946-0958 now"),
        (2, "server 10.0.52.25 and 192.168.1.1"),
        (3, "nothing here"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"])
           for r in pii_scan(docs).collect()}
    assert got == {0: (2, 0, 0), 1: (0, 2, 0), 2: (0, 0, 2), 3: (0, 0, 0)}
    red = {r["doc_id"]: r["redacted"]
           for r in pii_scan(docs, redact=True).collect()}
    assert red[0] == "reach me at <EMAIL> or <EMAIL> thanks"
    assert red[1] == "call <PHONE> or <PHONE> now"
    assert red[2] == "server <IPV4> and <IPV4>"
    assert red[3] == "nothing here"


def test_repetition_stats_semantics(spark):
    from rdf_indexer_spark.textops import repetition_stats

    docs = spark.createDataFrame([
        (0, "a b\na b\nc d"),       # 3 lines, 2 dup: frac 1/3; chars 8/12
        (1, "a b c d"),             # single line, no dups
        (2, ""),                    # degenerate
        (3, "x y\n\n  \nx y"),      # blank lines dropped; both dup
        (4, "a a a b"),             # 2-grams: aa aa ab → dup 1/3
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_lines"] == 3
    assert abs(got[0]["dup_line_frac"] - (1 - 2 / 3)) < 1e-6
    # dup lines "a b"×2 = 6 chars of 9 total ("a b","a b","c d")
    assert abs(got[0]["dup_line_char_frac"] - 6 / 9) < 1e-6
    assert got[1]["dup_line_frac"] == 0.0
    assert got[2]["n_lines"] == 0 and got[2]["dup_2gram_frac"] == 0.0
    assert got[3]["n_lines"] == 2 and got[3]["dup_line_frac"] == 0.5
    assert abs(got[4]["dup_2gram_frac"] - (1 - 2 / 3)) < 1e-6
