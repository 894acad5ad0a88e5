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
