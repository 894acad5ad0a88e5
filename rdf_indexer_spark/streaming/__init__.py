"""Structured Streaming surface.

The reference has NO streaming (a synchronous file queue,
``RDFIndexer.java:42,355-363`` — SURVEY.md §2.J); batch is the engine's
primary mode. This package adds the streaming-shaped equivalents a live
corpus needs: watermarked tumbling-window aggregation over an events stream
an incremental index-refresh pipeline (micro-batch postings deltas), and a
custom stateful operator — gap sessionization via ``applyInPandasWithState``
with event-time timeouts — sharing the exact same tokenizer/scoring code as
the batch path.
"""

from .events import incremental_postings_stream, windowed_event_counts
from .sessions import sessionize_batch, sessionize_events

__all__ = [
    "windowed_event_counts", "incremental_postings_stream",
    "sessionize_events", "sessionize_batch",
]
