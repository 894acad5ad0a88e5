"""CLI contract tests for scripts/run_query.py (ADVICE r4, low): batch mode
must reject flags it would silently ignore and duplicate query strings
that would collapse into one result set."""

import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")


def _main():
    import run_query

    return run_query.main


@pytest.mark.parametrize("argv", [
    ["--index-dir", "/tmp/idx", "--query", "a", "--query", "b", "--exhaustive"],
    ["--index-dir", "/tmp/idx", "--query", "a", "--query", "b", "--distributed"],
    ["--index-dir", "/tmp/idx", "--query", "a", "--query", "b",
     "--no-distributed"],
    ["--index-dir", "/tmp/idx", "--query", "a", "--query", "a"],
])
def test_batch_mode_rejects_invalid_combinations(argv, capsys):
    with pytest.raises(SystemExit) as e:
        _main()(argv)
    assert e.value.code == 2  # argparse usage error, before any Spark work
    err = capsys.readouterr().err
    assert "--query" in err


@pytest.mark.parametrize("argv", [
    ["--index-dir", "/tmp/idx", "--query", "a", "--phrase", "--exhaustive"],
    ["--index-dir", "/tmp/idx", "--query", "a", "--phrase", "--distributed"],
    ["--index-dir", "/tmp/idx", "--query", "a", "--query", "b", "--phrase"],
])
def test_phrase_flag_rejects_invalid_combinations(argv, capsys):
    with pytest.raises(SystemExit) as e:
        _main()(argv)
    assert e.value.code == 2
    assert "--phrase" in capsys.readouterr().err


def test_run_index_rejects_rdf_positions(capsys):
    import run_index

    with pytest.raises(SystemExit) as e:
        run_index.main(["--input", "/tmp/x", "--index-dir", "/tmp/idx",
                        "--rdf", "--positions"])
    assert e.value.code == 2
    assert "--positions" in capsys.readouterr().err


def test_run_maintain_full_loop(spark, tmp_path, capsys):
    """The maintenance CLI drives the reference's purge → re-post loop end
    to end: delete-by-query, update, append, compact — each printing a
    JSON summary, with the final index equal to a fresh build over the
    surviving corpus on the default query path."""
    import json

    import run_maintain
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.index.build import build_index

    docs = [(i, f"alpha w{i % 7} beta common") for i in range(40)]
    idx = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(docs, ["doc_id", "text"]),
                idx, num_buckets=2, resume=False)

    assert run_maintain.main(
        ["delete", "--index-dir", idx, "--where", "doc_id >= 35"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"op": "delete", "tombstones": 5}

    upd = str(tmp_path / "upd.parquet")
    spark.createDataFrame([(0, "replaced zebra text")], ["doc_id", "text"]
                          ).write.parquet(upd)
    assert run_maintain.main(
        ["update", "--index-dir", idx, "--input", upd,
         "--num-buckets", "1"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["op"] == "update"

    app = str(tmp_path / "app.parquet")
    spark.createDataFrame([(41, "brand new gamma doc")], ["doc_id", "text"]
                          ).write.parquet(app)
    assert run_maintain.main(
        ["append", "--index-dir", idx, "--input", app,
         "--num-buckets", "1"]) == 0
    capsys.readouterr()

    assert run_maintain.main(["compact", "--index-dir", idx]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["op"] == "compact"

    r = IndexReader(spark, idx)
    assert len(r.tombstones) == 0
    assert dict(r.search_wand("zebra", 5))
    assert dict(r.search_wand("gamma", 5))
    assert all(d < 35 or d >= 40 for d, _ in r.search_wand("alpha", 100))


@pytest.mark.parametrize("argv", [
    ["--index-dir", "/tmp/idx", "--query", "+a -b", "--lucene", "--phrase"],
    ["--index-dir", "/tmp/idx", "--query", "+a -b", "--lucene",
     "--exhaustive"],
    ["--index-dir", "/tmp/idx", "--query", "a", "--query", "b", "--lucene"],
])
def test_lucene_flag_rejects_invalid_combinations(argv, capsys):
    with pytest.raises(SystemExit) as e:
        _main()(argv)
    assert e.value.code == 2
    assert "--lucene" in capsys.readouterr().err


def test_run_query_lucene_end_to_end(spark, tmp_path, capsys):
    """--lucene serves a classic query string through the boolean walk."""
    import json

    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.bm25 import IndexReader

    idx = str(tmp_path / "cliluc")
    docs = spark.createDataFrame(
        [(i, "alpha " + ("beta " if i % 2 else "") + f"w{i % 5}")
         for i in range(60)], ["doc_id", "text"])
    build_index(spark, docs, idx, num_buckets=2, resume=False)
    rc = _main()(["--index-dir", idx, "--query", "+alpha -beta w1^2",
                  "--lucene", "--k", "5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "lucene"
    want = IndexReader(spark, idx).search_lucene("+alpha -beta w1^2", 5)
    assert out["hits"] == [[d, s] for d, s in want]
    # --mm passes through to min_should_match
    rc = _main()(["--index-dir", idx, "--query", "alpha beta w1",
                  "--lucene", "--mm", "2", "--k", "5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = IndexReader(spark, idx).search_lucene(
        "alpha beta w1", 5, min_should_match=2)
    assert out["hits"] == [[d, s] for d, s in want]


def test_run_query_slop_and_flag_guards(spark, tmp_path, capsys):
    """--slop rides --phrase (ordered near-match); --slop/--mm without
    their base flags are argparse errors."""
    import json

    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.bm25 import IndexReader

    idx = str(tmp_path / "clislop")
    docs = spark.createDataFrame(
        [(0, "a c b"), (1, "a b"), (2, "b a"), (3, "a c c b")],
        ["doc_id", "text"])
    build_index(spark, docs, idx, num_buckets=1, resume=False,
                positions=True)
    rc = _main()(["--index-dir", idx, "--query", "a b",
                  "--phrase", "--slop", "1", "--k", "10"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = IndexReader(spark, idx).search_phrase("a b", 10, slop=1)
    assert out["hits"] == [[d, s] for d, s in want]
    assert {h[0] for h in out["hits"]} == {0, 1}
    for argv, flag in [
        (["--index-dir", idx, "--query", "a b", "--slop", "1"], "--slop"),
        (["--index-dir", idx, "--query", "a b", "--mm", "2"], "--mm"),
    ]:
        with pytest.raises(SystemExit) as e:
            _main()(argv)
        assert e.value.code == 2
        assert flag in capsys.readouterr().err


def test_run_query_after_cursor(spark, tmp_path, capsys):
    """--after doc:score pages the default walk; malformed/ineligible
    combinations are argparse errors."""
    import json

    from rdf_indexer_spark.index.build import build_index
    from rdf_indexer_spark.index.bm25 import IndexReader

    idx = str(tmp_path / "cliafter")
    docs = spark.createDataFrame(
        [(i, "alpha " + ("beta " if i % 2 else "") + f"w{i % 5}")
         for i in range(60)], ["doc_id", "text"])
    build_index(spark, docs, idx, num_buckets=2, resume=False)
    reader = IndexReader(spark, idx)
    page1 = reader.search_wand("alpha beta", 5)
    d0, s0 = page1[-1]
    rc = _main()(["--index-dir", idx, "--query", "alpha beta",
                  "--k", "5", "--after", f"{d0}:{s0!r}"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = reader.search_wand("alpha beta", 10)[5:]
    assert out["hits"] == [[d, s] for d, s in want]
    for argv in [
        ["--index-dir", idx, "--query", "a", "--after", "notacursor"],
        ["--index-dir", idx, "--query", "a", "--after", "3:0.5",
         "--exhaustive"],
        ["--index-dir", idx, "--query", "a", "--query", "b",
         "--after", "3:0.5"],
    ]:
        with pytest.raises(SystemExit) as e:
            _main()(argv)
        assert e.value.code == 2
        assert "--after" in capsys.readouterr().err


def test_run_query_explain(spark, tmp_path, capsys):
    """--explain prints the planner debug JSON instead of searching."""
    import json

    from rdf_indexer_spark.index.build import build_index

    idx = str(tmp_path / "cliexp")
    docs = spark.createDataFrame(
        [(i, f"alpha w{i % 5}") for i in range(40)], ["doc_id", "text"])
    build_index(spark, docs, idx, num_buckets=2, resume=False)
    rc = _main()(["--index-dir", idx, "--query", "alpha zzz", "--explain"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["missing_terms"] == ["zzz"]
    assert out["route"] in ("driver", "distributed")
    assert out["terms"]["alpha"]["df"] == 40
    with pytest.raises(SystemExit):
        _main()(["--index-dir", idx, "--query", "a", "--explain",
                 "--lucene"])
