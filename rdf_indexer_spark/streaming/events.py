"""Streaming jobs: watermarked windowed aggregation + incremental postings.

Both are thin ``readStream`` → transform → ``writeStream`` plans whose
transformation stage is shared verbatim with the batch engine (the tokenizer
is analyzer.T-11; the window agg mirrors queries.q_events_tumbling), so batch
and streaming results agree by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokenize_col


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums with late-data watermarking.

    ``stream``: a streaming DataFrame with (ts timestamp, event_type string,
    value double). Late rows beyond the watermark are dropped; state is
    bounded — the plan is safe for an unbounded source."""
    return (
        # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def incremental_postings_stream(doc_stream: DataFrame) -> DataFrame:
    """Micro-batch postings deltas: new documents → (term, doc_id, tf, dl).

    Append-mode output; each micro-batch's rows are exactly the postings a
    batch rebuild would produce for those docs (same tokenizer, same groupBy
    shape as index/build.py stage 2), so an index refresh is a blind append
    of per-batch parquet + a manifest row — the streaming twin of the
    checkpointed bucket build."""
    toks = doc_stream.select(
        "doc_id", tokenize_col(F.col("text")).alias("toks")
    )
    return (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )
