"""J-1..J-8: compare-mode diffs and reference resolution."""

import json

import pytest
from pyspark.sql import functions as F

DOC_SCHEMA = "file string, uri string, fields map<string, array<string>>"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(f, u, m) for f, u, m in rows], DOC_SCHEMA
    )


def test_compare_classification(spark):
    from rdf_indexer_spark.compare import compare_archives

    new = _docs(spark, [
        ("f", "u1", {"title": ["Same"], "genre": ["Poetry"]}),
        ("f", "u2", {"title": ["Changed new"], "extra_field": ["x"]}),
        ("f", "u4", {"title": ["Brand new doc"]}),
    ])
    old = _docs(spark, [
        ("f", "u1", {"title": ["Same"], "genre": ["Poetry"]}),
        ("f", "u2", {"title": ["Changed old"], "old_only": ["y"]}),
        ("f", "u3", {"title": ["Vanished doc"]}),
    ])
    res = compare_archives(new, old)
    assert [r["uri"] for r in res["skipped"].collect()] == ["u3"]
    assert [r["uri"] for r in res["added"].collect()] == ["u4"]
    msgs = sorted(r["message"] for r in res["errors"].collect())
    assert 'title mismatched: "Changed new" (new) vs. "Changed old" (old)' in msgs
    assert "extra_field x introduced in reindexing." in msgs
    assert "Key not reindexed: old_only=y" in msgs
    assert len(msgs) == 3  # u1 identical → nothing


def test_compare_whitespace_tolerance(spark):
    from rdf_indexer_spark.compare import compare_archives

    new = _docs(spark, [("f", "u1", {"title": ["a  b\tc"]})])
    old = _docs(spark, [("f", "u1", {"title": ["a b c"]})])
    res = compare_archives(new, old)
    # whitespace-normalized re-check suppresses the diff (RDFCompare:482-484)
    assert res["errors"].count() == 0


def test_compare_multivalue_solr_string(spark):
    from rdf_indexer_spark.compare import compare_archives

    new = _docs(spark, [("f", "u1", {"genre": ["Poetry", "Drama"]})])
    old = _docs(spark, [("f", "u1", {"genre": ["Poetry", "Fiction"]})])
    msgs = [r["message"] for r in compare_archives(new, old)["errors"].collect()]
    assert msgs == [
        'genre mismatched: "Poetry | Drama" (new) vs. "Poetry | Fiction" (old)'
    ]


def test_compare_text_path(spark):
    from rdf_indexer_spark.compare import compare_archives

    base = "word " * 20
    new = _docs(spark, [
        ("f", "u1", {"text": [base + "ending one"], "has_full_text": ["T"], "is_ocr": ["F"]}),
        ("f", "u2", {"has_full_text": ["T"], "is_ocr": ["F"]}),
    ])
    old = _docs(spark, [
        ("f", "u1", {"text": [base + "ending two"]}),
        ("f", "u2", {"text": ["old text that vanished"]}),
    ])
    res = compare_archives(new, old)
    msgs = [r["message"] for r in res["txt_errors"].collect()]
    assert any("mismatch at line 0 col" in m for m in msgs)
    assert any("text field has disappeared" in m for m in msgs)


def test_text_size_stats(spark):
    from rdf_indexer_spark.compare import text_size_stats

    docs = _docs(spark, [
        ("f", f"u{i}", {"text": ["x" * (10 * (i + 1))]}) for i in range(10)
    ])
    row = text_size_stats(docs, windows=(2, 5)).collect()[0]
    assert row["docs"] == 10
    assert row["docs_with_text"] == 10
    assert row["total_text_bytes"] == sum(10 * (i + 1) for i in range(10))
    assert row["max_text_bytes"] == 100
    assert row["max_window_2"] == 90 + 100
    assert row["max_window_5"] == sum([60, 70, 80, 90, 100])


def test_resolve_references(spark):
    from rdf_indexer_spark.resolve import resolve_references

    docs = _docs(spark, [
        ("f", "http://x/parent", {
            "uri": ["http://x/parent"],
            "title": ["Parent"],
            "hasPart": ["http://x/child1", "http://x/child2", "http://x/missing"],
        }),
        ("f", "http://x/child1", {
            "uri": ["http://x/child1"], "title": ["C1"],
            "isPartOf": ["http://x/parent"],
            "text": ["secret text that must be stripped"],
        }),
        ("f", "http://x/child2", {
            "uri": ["http://x/child2"], "title": ["C2"],
        }),
    ])
    out, errors = resolve_references(docs)
    emsgs = [r["message"] for r in errors.collect()]
    assert emsgs == ["Unable to resolve reference to http://x/missing"]

    parent = out.filter(F.col("uri") == "http://x/parent").collect()[0]
    parts = parent["fields"]["hasPart"]
    assert len(parts) == 2  # two resolved (missing one errored)
    j1 = json.loads(parts[0])
    assert j1["title"] == ["C1"]
    assert "text" not in j1  # J-2: excess fields stripped
    # child1's own isPartOf also resolved
    child1 = out.filter(F.col("uri") == "http://x/child1").collect()[0]
    assert json.loads(child1["fields"]["isPartOf"][0])["title"] == ["Parent"]
    # untouched doc passes through
    assert out.filter(F.col("uri") == "http://x/child2").collect()[0]["fields"]["title"] == ["C2"]


def test_global_order_rank_matches_global_window(spark):
    """global_order_rank (range-partition + offsets, parallel) must equal the
    single-task Window.orderBy rank it replaces — and must not put the full
    relation through a single-partition exchange."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rdf_indexer_spark.compare import global_order_rank

    rng = random.Random(11)
    keys = [f"uri-{rng.randrange(10**9):09d}" for _ in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], ["uri"]).repartition(13)

    got = {r["uri"]: r["rn"] for r in global_order_rank(df, "uri").collect()}
    w = Window.orderBy("uri")
    want = {r["uri"]: r["rn"]
            for r in df.withColumn("rn", F.row_number().over(w) - 1).collect()}
    assert got == want

    # plan check: the wide relation reaches the rank stage through the
    # eagerly-materialized range-partitioned localCheckpoint (scanned as an
    # existing RDD), never through a fresh global sort — the only
    # SinglePartition in the post-checkpoint plan is the tiny
    # per-partition-counts window (~num_partitions rows)
    out = global_order_rank(df, "uri")
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "scan existingrdd" in plan
    assert "sortmergejoin" not in plan  # offsets join is a broadcast
    # no fresh global range-sort of the wide relation after the checkpoint
    assert "rangepartitioning" not in plan


def test_global_order_rank_reliable_checkpoint(spark, tmp_path):
    """ADVICE r3: the localCheckpoint default requires static executors;
    reliable=True uses a real checkpoint dir and survives executor loss.
    Ranks must be identical on both postures."""
    import pytest as _pytest

    from rdf_indexer_spark.compare import global_order_rank

    df = spark.createDataFrame([(f"u{i:03d}",) for i in range(57)], ["uri"])
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        with _pytest.raises(ValueError):
            global_order_rank(df, "uri", "rn", reliable=True).count()
    sc.setCheckpointDir(str(tmp_path / "ck"))
    out = global_order_rank(df, "uri", "rn", reliable=True)
    got = {r["uri"]: r["rn"] for r in out.collect()}
    assert got == {f"u{i:03d}": i for i in range(57)}


def test_global_order_rank_default_posture(spark, tmp_path):
    """VERDICT r4 item 8: the default (reliable=None) auto-selects the
    posture — localCheckpoint when no checkpoint dir is configured, the
    fault-tolerant reliable checkpoint as soon as one is, so cluster
    callers that called setCheckpointDir get executor-loss safety without
    passing a flag."""
    import os

    from rdf_indexer_spark.compare import global_order_rank

    df = spark.createDataFrame([(f"k{i:02d}",) for i in range(23)], ["uri"])
    sc = spark.sparkContext
    want = {f"k{i:02d}": i for i in range(23)}
    if sc.getCheckpointDir() is None:
        # localCheckpoint arm: works with NO checkpoint dir configured
        got = {r["uri"]: r["rn"]
               for r in global_order_rank(df, "uri").collect()}
        assert got == want

    ckdir = tmp_path / "auto_ck"
    sc.setCheckpointDir(str(ckdir))
    got = {r["uri"]: r["rn"] for r in global_order_rank(df, "uri").collect()}
    assert got == want
    # the default must have taken the RELIABLE arm: checkpoint files landed
    written = [os.path.join(dp, f)
               for dp, _, fs in os.walk(ckdir) for f in fs]
    assert written, "default posture ignored the configured checkpoint dir"
