"""Stable, dense 64-bit doc_id assignment without a global sort.

A global ``row_number() over (orderBy uri)`` is a single-partition sort — a
non-starter at 10^12 rows. Instead: hash-bucket the key, sort *within* each
bucket (parallel), and add per-bucket offsets computed from bucket counts
(one tiny action over ``num_buckets`` rows). The result is deterministic for
a given key set and independent of input partitioning / parallelism — which
the rank-identity discipline requires (SURVEY.md §4.3.4/6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_doc_ids(
    df: DataFrame,
    key_cols: list[str],
    num_buckets: int = 256,
    out_col: str = "doc_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Add a dense, deterministic ``doc_id`` ordered by ``key_cols``
    within hash buckets (globally unique, NOT globally key-ordered —
    global order is never required by the index, only stability).

    ``tiebreak_cols`` extends the in-bucket ordering so rows whose
    ``key_cols`` are NOT unique (e.g. the same URI emitted by two RDF
    files, which the pipeline surfaces as 'Duplicate URI' errors) still get
    run-stable relative ids — otherwise the doc_id↔row mapping could vary
    across runs and break rank determinism."""
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets))
    with_bucket = df.withColumn("_b", bucket)
    counts = {
        r["_b"]: r["cnt"]
        for r in with_bucket.groupBy("_b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offset_map = F.create_map(
        *[F.lit(x) for b in range(num_buckets) for x in (b, offsets[b])]
    )
    order = [F.col(c) for c in key_cols]
    order += [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy("_b").orderBy(*order)
    return (
        with_bucket.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            out_col,
            (F.element_at(offset_map, F.col("_b")) + F.col("_rn") - 1).cast("long"),
        )
        .drop("_b", "_rn")
    )
