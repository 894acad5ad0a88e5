#!/usr/bin/env python
"""spark-submit entrypoint for the index build (north-star launch shape):

    zip -r rdf_indexer_spark.zip rdf_indexer_spark
    spark-submit --py-files rdf_indexer_spark.zip scripts/run_index.py \\
        --input /data/code_corpus --index-dir /data/index \\
        --num-buckets 4096 --buckets-per-job 128

On a cluster the session comes from spark-submit's master/conf; local runs
fall back to the engine's session factory. The input is the north-rule
corpus shape (repo, path, commit, lang, content); ``--rdf`` switches to the
reference-shaped RDF/XML file table (file, content).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet path: (repo,path,commit,lang,content) "
                         "or (file,content) with --rdf")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--buckets-per-job", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true",
                    help="discard any existing manifest and rebuild")
    ap.add_argument("--positions", action="store_true",
                    help="build a POSITIONAL index (stores per-posting "
                         "token positions; enables phrase queries)")
    ap.add_argument("--rdf", action="store_true",
                    help="input is an RDF/XML file table (reference shape; "
                         "--positions is not supported on this path)")
    ap.add_argument("--archive", default=None,
                    help="archive name for V-10 validation (--rdf only)")
    args = ap.parse_args(argv)
    if args.rdf and args.positions:
        ap.error("--positions is not supported with --rdf (the RDF path "
                 "indexes reference-shaped documents bag-of-words)")

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from rdf_indexer_spark.session import get_spark

        spark = get_spark(app_name="index-build")

    df = spark.read.parquet(args.input)
    if args.rdf:
        from rdf_indexer_spark.indexer import index_rdf_corpus

        errors, summary = index_rdf_corpus(
            spark, df, args.index_dir,
            archive_name=args.archive,
            num_buckets=args.num_buckets,
            resume=not args.no_resume,
        )
        summary["n_errors"] = errors.count()
    else:
        from rdf_indexer_spark.indexer import index_code_corpus

        summary = index_code_corpus(
            spark, df, args.index_dir,
            num_buckets=args.num_buckets,
            resume=not args.no_resume,
            buckets_per_job=args.buckets_per_job,
            positions=args.positions,
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
