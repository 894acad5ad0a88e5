"""Search-result highlighting (Solr ``hl=true``): per-hit snippets with the
query terms marked up — the last piece of the serving response the
reference's index feeds (Solr's highlighter runs over stored fields; our
stored text is the source documents table, which the table-fed engine
always has).

Deterministic, cross-engine-restatable snippet definition (so the DuckDB
oracle can rebuild it byte-for-byte):

* tokens = the engine's pinned tokenizer (analyzer.TOKEN_RE — identical in
  Python / JVM / DuckDB RE2 form);
* candidate windows = every start ``s`` in ``[0, max(len - W, 0)]`` of
  ``W`` consecutive tokens;
* the snippet window is the one containing the MOST query-term occurrences,
  ties broken by the earliest start (Lucene's highlighter picks the densest
  fragment the same way);
* snippet text = the window's tokens joined by single spaces, each
  query-term token wrapped in ``pre``/``post`` tags.

Snippets are built from the normalized token stream, not raw character
offsets — byte-faithful to the scoring pipeline (and restatable in SQL),
at the cost of original whitespace/punctuation, which the reference's own
compare pipeline also normalizes away before diffing (T-1/T-8).

Scale shape: hits are a top-k set (k rows), so the text fetch is a
broadcast semi-join of k ids against the documents scan — a point-lookup
scan, not a shuffle — and the window scoring runs vectorized per hit row
inside one mapInPandas pass. Nothing is proportional to corpus size except
the pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyzer import TOKEN_RE, tokenize

__all__ = ["highlight_hits"]


def _best_window(toks: list[str], terms: set[str], window: int) -> int:
    """Start of the densest ``window``-token span (ties: earliest start).

    Computed as an explicit argmax over EVERY candidate start via a
    prefix-sum difference — the same enumerate-all-starts definition the
    DuckDB oracle restates, so the tie-break is structurally identical
    (numpy argmax returns the first maximum = the smallest s)."""
    import numpy as np

    if len(toks) <= window:
        return 0
    is_match = np.fromiter((t in terms for t in toks), bool, len(toks))
    c = np.concatenate(([0], np.cumsum(is_match)))
    return int(np.argmax(c[window:] - c[:-window]))


def highlight_hits(
    docs_df: DataFrame, hits_df: DataFrame, query: str, *,
    window: int = 8, pre: str = "<em>", post: str = "</em>",
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Attach a highlighted snippet to each hit.

    ``hits_df`` is a small top-k result (doc_id + any ranking columns —
    all are carried through); ``docs_df`` is the stored-text table.
    Returns the hit columns plus ``snippet``."""
    terms = set(tokenize(query))
    hit_cols = hits_df.columns
    joined = docs_df.select(id_col, text_col).join(
        F.broadcast(hits_df), id_col)

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            snips = []
            for text in pdf[text_col]:
                toks = TOKEN_RE.findall((text or "").lower())
                s = _best_window(toks, terms, window)
                span = toks[s:s + window]
                snips.append(" ".join(
                    f"{pre}{t}{post}" if t in terms else t for t in span))
            out = pdf[hit_cols].copy()
            out["snippet"] = snips
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in hits_df.schema.fields) + ", snippet string"
    return joined.mapInPandas(_kernel, schema=schema)
