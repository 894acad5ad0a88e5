"""Inverted-index build: documents → docstore + postings + packed blocks.

This internalizes what the reference ships to Solr over HTTP
(``SolrClient.java:210-236``): the index itself. Spark-first shape
(SURVEY.md §3.1):

  stage 1 (narrow): tokenize (JVM-native regexp, T-11) → dl, sha256
  stage 2 (shuffle): ``groupBy(term, doc_id)`` → tf   (map-side partial agg)
  stage 3 (shuffle by term within a doc-bucket): ``applyInPandas`` block
           packing → delta+varbyte blocks with block-max metadata

**Partitioning / skew / scale.** The corpus is processed in ``num_buckets``
doc-id range partitions (doc_ids are dense and bucket-contiguous, see
``docids.py``). Each bucket is an independent job whose outputs — docstore
part, postings part, term blocks covering that doc range — commit atomically
with a manifest row (lineage + row/token/posting counts + content-sha
aggregate). An interrupted build resumes by anti-joining pending buckets
against the manifest (zero recomputation of completed buckets). Because
bucket doc-ranges are disjoint and sorted, per-bucket term blocks concatenate
into globally sorted posting lists — the merge the reference's Solr performs
at segment level is free here by construction; this bucket scheme is also the
salted-key mitigation for Zipf-hot terms (a hot term's postings pack in ≤
``num_buckets`` independent tasks, never one).

At cluster scale the same code runs with buckets sized to executor memory
(e.g. 4096 buckets over 10^12 docs) and the parquet writes become Iceberg
``append``s with snapshot ids in the manifest.

Blocks store ``(max_tf, dl_min)`` so query time can compute the block-max
BM25 bound for any (k1, b, avgdl): score is increasing in tf and decreasing
in dl, hence ``bound = idf · max_tf/(max_tf + K(dl_min))`` dominates every
member posting.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import tokenize_col
from .codec import BLOCK_SIZE, pack_block
from .manifest import Manifest

BLOCK_SCHEMA = (
    "term string, seq int, n int, first_doc_id long, last_doc_id long, "
    "max_tf int, dl_min int, ids_bin binary, tfs_bin binary, dls_bin binary"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docstore(self) -> str:
        return os.path.join(self.root, "docstore")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def blocks(self) -> str:
        return os.path.join(self.root, "blocks")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats")

    @property
    def termstats(self) -> str:
        return os.path.join(self.root, "termstats")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")


def _pack_term_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (term)-within-bucket group → block rows."""
    term = pdf["term"].iloc[0]
    order = np.argsort(pdf["doc_id"].values, kind="stable")
    ids = pdf["doc_id"].values[order].astype(np.int64)
    tfs = pdf["tf"].values[order].astype(np.int64)
    dls = pdf["dl"].values[order].astype(np.int64)
    rows = []
    for seq, start in enumerate(range(0, len(ids), BLOCK_SIZE)):
        bi = ids[start: start + BLOCK_SIZE]
        bt = tfs[start: start + BLOCK_SIZE]
        bd = dls[start: start + BLOCK_SIZE]
        ids_bin, tfs_bin, dls_bin = pack_block(bi, bt, bd)
        rows.append({
            "term": term, "seq": seq, "n": len(bi),
            "first_doc_id": int(bi[0]), "last_doc_id": int(bi[-1]),
            "max_tf": int(bt.max()), "dl_min": int(bd.min()),
            "ids_bin": ids_bin, "tfs_bin": tfs_bin, "dls_bin": dls_bin,
        })
    return pd.DataFrame(rows)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
    meta_cols: tuple[str, ...] = (),
    resume: bool = True,
) -> dict:
    """Build (or resume) the full index for ``docs`` under ``index_dir``.

    ``docs`` must carry a dense ``id_col`` (use ``docids.assign_doc_ids``
    otherwise). Returns the manifest summary dict.
    """
    paths = IndexPaths(index_dir)
    manifest = Manifest(paths.manifest)
    if not resume:
        manifest.reset()
        for p in (paths.docstore, paths.postings, paths.blocks,
                  paths.stats, paths.termstats):
            _rm(p)

    n_docs = docs.count()
    bounds = _bucket_bounds(n_docs, num_buckets)

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *[F.col(c) for c in meta_cols],
    )

    for bucket, (lo, hi) in enumerate(bounds):
        key = f"bucket={bucket:05d}"
        if resume and manifest.is_done("build", key):
            continue
        manifest.start("build", key)
        part = base.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        toks = part.withColumn("toks", tokenize_col(F.col("text")))
        enriched = toks.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.sha2(F.col("text"), 256).alias("content_sha256"),
            "toks",
            *[F.col(c) for c in meta_cols],
        ).persist()

        docstore_part = enriched.drop("toks")
        docstore_part.write.mode("overwrite").parquet(
            os.path.join(paths.docstore, key)
        )

        postings = (
            enriched.select("doc_id", "dl", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count("*").alias("tf"))
        )
        postings.write.mode("overwrite").parquet(
            os.path.join(paths.postings, key)
        )
        postings_df = spark.read.parquet(os.path.join(paths.postings, key))

        blocks = postings_df.groupBy("term").applyInPandas(
            _pack_term_group, schema=BLOCK_SCHEMA
        )
        blocks.write.mode("overwrite").parquet(os.path.join(paths.blocks, key))

        stats_row = enriched.agg(
            F.count("*").alias("rows"),
            F.sum("dl").alias("tokens"),
            # order-independent content lineage: xor-free additive sha agg
            F.sum(F.conv(F.substring("content_sha256", 1, 15), 16, 10).cast("decimal(38,0)")).alias("sha_agg"),
        ).collect()[0]
        n_postings = postings_df.count()
        enriched.unpersist()
        manifest.finish(
            "build", key,
            rows=stats_row["rows"] or 0, tokens=int(stats_row["tokens"] or 0),
            postings=n_postings, sha_agg=str(stats_row["sha_agg"] or 0),
        )

    # ---- finalize: corpus + term statistics (global, skew-safe aggs) ----
    if not (resume and manifest.is_done("finalize", "stats")):
        manifest.start("finalize", "stats")
        docstore = spark.read.parquet(os.path.join(paths.docstore, "*"))
        stats = docstore.agg(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total_tokens"),
        )
        stats.coalesce(1).write.mode("overwrite").parquet(paths.stats)
        postings_all = spark.read.parquet(os.path.join(paths.postings, "*"))
        termstats = postings_all.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        termstats.write.mode("overwrite").parquet(paths.termstats)
        manifest.finish("finalize", "stats")

    return manifest.summary()


def _bucket_bounds(n_docs: int, num_buckets: int) -> list[tuple[int, int]]:
    """Contiguous doc_id ranges covering [0, n_docs)."""
    per = (n_docs + num_buckets - 1) // max(num_buckets, 1)
    per = max(per, 1)
    return [(i * per, min((i + 1) * per, n_docs)) for i in range(num_buckets)
            if i * per < n_docs]


def _rm(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
