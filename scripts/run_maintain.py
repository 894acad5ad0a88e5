#!/usr/bin/env python
"""spark-submit entrypoint for index maintenance — the reference's
operational loop (purge archive → re-post documents,
RDFIndexer.java:214-232) as first-class index mutations:

    spark-submit ... scripts/run_maintain.py delete --index-dir I --where "lang = 'go'"
    spark-submit ... scripts/run_maintain.py append --index-dir I --input new_docs.parquet
    spark-submit ... scripts/run_maintain.py update --index-dir I --input updated.parquet
    spark-submit ... scripts/run_maintain.py compact --index-dir I

`append`/`update` inputs are (doc_id, text) parquet (update targets
existing doc ids; append requires fresh dense ids from the current count
on). `compact` physically drops tombstoned docs and refreshes corpus/term
statistics (Lucene expungeDeletes). Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_del = sub.add_parser("delete", help="tombstone docs by SQL predicate")
    p_del.add_argument("--index-dir", required=True)
    p_del.add_argument("--where", required=True,
                       help="SQL predicate over the docstore")

    p_app = sub.add_parser("append", help="append new documents")
    p_app.add_argument("--index-dir", required=True)
    p_app.add_argument("--input", required=True)
    p_app.add_argument("--num-buckets", type=int, default=4)

    p_upd = sub.add_parser("update", help="replace documents in place")
    p_upd.add_argument("--index-dir", required=True)
    p_upd.add_argument("--input", required=True)
    p_upd.add_argument("--num-buckets", type=int, default=4)

    p_cmp = sub.add_parser("compact", help="drop tombstoned docs, refresh stats")
    p_cmp.add_argument("--index-dir", required=True)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from rdf_indexer_spark.session import get_spark

        spark = get_spark(app_name=f"index-{args.cmd}")

    from rdf_indexer_spark.index import maintain as M

    if args.cmd == "delete":
        n = M.delete_by_query(spark, args.index_dir, args.where)
        out = {"op": "delete", "tombstones": int(n)}
    elif args.cmd == "append":
        docs = spark.read.parquet(args.input)
        out = {"op": "append", "summary": M.append_documents(
            spark, docs, args.index_dir, num_buckets=args.num_buckets)}
    elif args.cmd == "update":
        docs = spark.read.parquet(args.input)
        out = {"op": "update", "summary": M.update_documents(
            spark, docs, args.index_dir, num_buckets=args.num_buckets)}
    else:
        out = {"op": "compact", "summary": M.compact_index(
            spark, args.index_dir)}
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
