"""End-to-end pipelines — the engine's equivalents of the reference modes
(``RDFIndexerConfig.java:32-41``): TEST / INDEX / COMPARE / RESOLVE.

Two front doors:

* :func:`index_rdf_corpus` — the reference-shaped path: RDF/XML files →
  triples → documents → validation → inverted index (replaces
  ``RDFIndexer.doIndexing`` + Solr, ``RDFIndexer.java:214-232``).

* :func:`index_code_corpus` — the north-rule path: an Iceberg-style table of
  source-code repositories ``(repo, path, commit, lang, content)`` →
  doc ids over the natural key → inverted index with per-row
  ``sha256(content)`` lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compare import to_solr_string
from .fields import assemble_documents
from .index.build import build_index
from .index.docids import assign_doc_ids
from .rdfxml import parse_files_df
from .validation import archive_match_errors, validate_documents


def parse_and_validate(
    spark: SparkSession,
    files_df: DataFrame,
    *,
    mode: str = "TEST",
    archive_name: str | None = None,
    is_pages: bool = False,
    fulltext_df: DataFrame | None = None,
    corrected_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """TEST mode: parse RDF/XML → documents + full error stream + links."""
    triples = parse_files_df(files_df)
    docs, errors, links = assemble_documents(
        triples, is_pages=is_pages, mode=mode,
        fulltext_df=fulltext_df, corrected_df=corrected_df,
    )
    docs, verrors = validate_documents(docs, is_pages=is_pages)
    errors = errors.unionByName(verrors)
    if archive_name is not None:
        errors = errors.unionByName(archive_match_errors(docs, archive_name))
    return docs, errors, links


def index_rdf_corpus(
    spark: SparkSession,
    files_df: DataFrame,
    index_dir: str,
    *,
    archive_name: str | None = None,
    is_pages: bool = False,
    fulltext_df: DataFrame | None = None,
    corrected_df: DataFrame | None = None,
    num_buckets: int = 8,
    resume: bool = True,
) -> tuple[DataFrame, dict]:
    """INDEX mode end-to-end: parse → validate → build the inverted index
    over each document's text field. Returns (errors, build summary)."""
    docs, errors, _links = parse_and_validate(
        spark, files_df, mode="INDEX", archive_name=archive_name,
        is_pages=is_pages, fulltext_df=fulltext_df, corrected_df=corrected_df,
    )
    text = to_solr_string(F.element_at(F.col("fields"), F.lit("text")))
    flat = docs.select(
        "file", "uri", F.coalesce(text, F.lit("")).alias("text")
    )
    # uri is the index's unique key (Solr overwrite semantics): when the
    # same uri arrives from multiple files — already surfaced upstream as
    # 'Duplicate URI' errors — exactly one deterministic winner is indexed
    # (last file name wins, content sha as final tiebreak), so doc ids and
    # ranks are stable across runs and partitionings.
    from pyspark.sql.window import Window

    w_dup = Window.partitionBy("uri").orderBy(
        F.desc("file"), F.desc(F.sha2("text", 256))
    )
    flat = (
        flat.withColumn("_dup", F.row_number().over(w_dup))
        .filter(F.col("_dup") == 1)
        .drop("_dup", "file")
    )
    flat = assign_doc_ids(flat, ["uri"])
    summary = build_index(
        spark, flat, index_dir,
        num_buckets=num_buckets, meta_cols=("uri",), resume=resume,
    )
    return errors, summary


def index_code_corpus(
    spark: SparkSession,
    repos_df: DataFrame,
    index_dir: str,
    *,
    num_buckets: int = 32,
    resume: bool = True,
    buckets_per_job: int | None = None,
    positions: bool = False,
) -> dict:
    """North-rule input (BASELINE.json input_hint): (repo, path, commit,
    lang, content) → inverted index keyed by dense doc ids over the natural
    key. The doc store carries (repo, path, commit, lang) plus the per-row
    content sha256 the invariant checks against the source table.
    ``positions=True`` builds the positional variant (phrase queries —
    build.build_index positions)."""
    # natural key should be unique; content sha tiebreak keeps ids
    # run-stable even if a malformed input repeats a key
    docs = assign_doc_ids(
        repos_df, ["repo", "path", "commit"],
        tiebreak_cols=["content"],
    )
    return build_index(
        spark,
        docs.select("doc_id", F.col("content").alias("text"),
                    "repo", "path", "commit", "lang"),
        index_dir,
        num_buckets=num_buckets,
        meta_cols=("repo", "path", "commit", "lang"),
        resume=resume,
        buckets_per_job=buckets_per_job,
        positions=positions,
    )
