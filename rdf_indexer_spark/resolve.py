"""RESOLVE mode (J-1/J-2): inline isPartOf / hasPart URI references.

The reference pages docs matching ``isPartOf:http* OR hasPart:http*`` and
issues an HTTP point-lookup per referenced URI, mutating docs in a fixpoint
loop (``RDFIndexer.java:453-562`` — an N+1 pattern). Here it is one job:

  explode refs → self equi-join on uri (broadcast when the ref set is small)
  → collect_list(to_json(resolved minus excess fields)) → rewrite the field.

Unresolved references become error rows (left-anti semantics, J-1).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RDFIndexer.java:567-587 — fields stripped from resolved reference docs
EXCESS_FIELDS = [
    "text", "text_url", "year", "year_sort", "year_sort_asc", "year_sort_desc",
    "decade", "quarter_century", "half_century", "century", "date_label",
    "source_xml", "source_html", "source_sgml", "batch", "_version_",
]

REF_FIELDS = ["isPartOf", "hasPart"]


def _http_ish(col):
    t = F.trim(col)
    return t.startswith("http://") & ~t.contains(" ")


def resolve_references(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Resolve reference fields in one pass → (docs', errors).

    ``docs``: (file, uri, fields map). Returns docs with isPartOf/hasPart
    values replaced by the JSON of the referenced documents (minus excess
    fields), and an errors DataFrame for unresolved references."""
    # 1. explode the reference edges
    edges = None
    for rf in REF_FIELDS:
        vals = F.element_at(F.col("fields"), F.lit(rf))
        e = docs.filter(vals.isNotNull()).select(
            F.col("uri").alias("src_uri"),
            F.lit(rf).alias("ref_field"),
            F.posexplode(vals).alias("ref_pos", "ref_uri"),
        ).filter(_http_ish(F.col("ref_uri")))
        edges = e if edges is None else edges.unionByName(e)
    if edges is None:
        return docs, docs.sparkSession.createDataFrame(
            [], "file string, uri string, message string"
        )

    # 2. resolve: equi-join against the doc store on uri (replaces the
    #    reference's per-URI Solr point lookups)
    targets = docs.select(
        F.col("uri").alias("ref_uri"),
        F.to_json(
            F.map_filter(F.col("fields"), lambda k, _: ~k.isin(EXCESS_FIELDS))
        ).alias("ref_json"),
    )
    resolved = edges.join(targets, "ref_uri", "left")

    errors = resolved.filter(F.col("ref_json").isNull()).select(
        F.lit("").alias("file"),
        F.col("src_uri").alias("uri"),
        F.concat(
            F.lit("Unable to resolve reference to "), F.col("ref_uri")
        ).alias("message"),
    )

    # 3. regroup per (doc, field) in original value order
    new_vals = (
        resolved.filter(F.col("ref_json").isNotNull())
        .groupBy("src_uri", "ref_field")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ref_pos", "ref_json"))),
                lambda s: s["ref_json"],
            ).alias("resolved_values")
        )
        .groupBy("src_uri")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("ref_field", "resolved_values"))
            ).alias("replacements")
        )
    )

    # 4. rewrite fields map (docs without references pass through untouched)
    out = docs.join(
        new_vals, docs["uri"] == new_vals["src_uri"], "left"
    ).select(
        docs["*"],
        F.col("replacements"),
    ).withColumn(
        "fields",
        F.when(
            F.col("replacements").isNotNull(),
            F.map_zip_with(
                F.col("fields"),
                F.col("replacements"),
                lambda _, v1, v2: F.coalesce(v2, v1),
            ),
        ).otherwise(F.col("fields")),
    ).drop("replacements")

    return out, errors
