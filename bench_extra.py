#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Two subcommands:

``python bench_extra.py stages [sf_dir] [names...]``
    Per-stage timings of the declared DataFrame queries with the noop sink
    (guide §1.4: computes every column, no sink cost, no count() pruning),
    plus the reader list-API stages timed as in bench.py. Prints one JSON
    line {"stage": sec, ...}.

``python bench_extra.py plans <out_dir> [sf_dir] [names...]``
    Writes ``<out_dir>/<name>.txt`` with ``explain("formatted")`` for each
    DataFrame-returning declared query (the plans/r06 deliverable). Run it
    once against the round-start tree (PYTHONPATH to a worktree of the old
    commit) for the *_before.txt files and once against the current tree
    for *_after.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# DataFrame-returning declared queries worth isolating (the operators this
# round touched, plus the heavy untouched ones kept as controls)
DF_QUERIES = [
    "multi_join_topk", "term_df", "token_count", "corpus_stats",
    "exact_dedup", "quality", "minhash_neardup", "simhash_neardup",
    "embed_neardup", "ann_cosine", "ann_batch", "ann_lsh", "langid",
    "fingerprints", "decontaminate", "pii_scan", "repetition",
    "agg_summary", "events_tumbling", "window_running", "sessionize",
    "bm25_batch", "bm25_facets", "facet_browse", "spell_suggest",
    "facet_range", "field_stats", "terms_component", "facet_pivot",
    "facet_queries", "bm25_sort_field", "bm25_grouped",
]


def _spark():
    from rdf_indexer_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app_name="bench_extra",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).count()
    tp = spark.sparkContext.defaultParallelism * 2
    spark.range(tp).repartition(tp).mapInPandas(lambda it: it, "id long").count()
    return spark


def _queries():
    import __spark_entry__ as E

    return E.queries()


def cmd_stages(sf: str, names: list[str]) -> None:
    spark = _spark()
    qs = _queries()
    names = names or DF_QUERIES
    out = {}
    for name in names:
        if name not in qs:
            continue
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf, "cpus": CPUS, "noop_stage_min2": out}))


def cmd_plans(out_dir: str, sf: str, names: list[str]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = _spark()
    qs = _queries()
    names = names or DF_QUERIES
    for name in names:
        if name not in qs:
            continue
        df = qs[name](spark, sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}.txt", file=sys.stderr)


def main() -> None:
    args = sys.argv[1:]
    if not args or args[0] == "stages":
        rest = args[1:] if args else []
        sf = rest[0] if rest and os.path.isdir(rest[0]) else SF_DIR
        names = rest[1:] if rest and os.path.isdir(rest[0]) else rest
        cmd_stages(sf, list(names))
    elif args[0] == "plans":
        out_dir = args[1]
        rest = args[2:]
        sf = rest[0] if rest and os.path.isdir(rest[0]) else SF_DIR
        names = rest[1:] if rest and os.path.isdir(rest[0]) else rest
        cmd_plans(out_dir, sf, list(names))
    else:
        raise SystemExit(f"unknown subcommand: {args[0]}")


if __name__ == "__main__":
    main()
