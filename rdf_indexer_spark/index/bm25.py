"""BM25 top-k retrieval: exhaustive scorer + block-max WAND (Q-9).

Similarity pinned per SURVEY.md §7.4 — Lucene ``BM25Similarity`` defaults,
exact form (no norm quantization):

    idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))
    score(d,q) = Σ_{t∈q} idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))
    k1 = 1.2, b = 0.75; ties broken (score desc, doc_id asc)

**Determinism discipline** (SURVEY.md §4.3.6): per-term idf values are
computed ONCE driver-side and injected as literals into both paths; per-doc
summation runs in ascending-term order in both paths (the exhaustive path
sorts the contribution array before folding). The two paths therefore agree
to float ulps and the test suite asserts rank + score identity.

**The two paths**:

* ``score_exhaustive`` — declarative DataFrame plan over the ``postings``
  table: broadcast the (tiny) query-term idf table, compute contributions
  JVM-side, fold per doc, ``orderBy(score desc, doc_id).limit(k)``. This is
  the oracle and the path whose physical plan Catalyst fully owns (predicate
  pushdown prunes the posting scan to the query's terms).

* ``search_wand`` — document-at-a-time iteration over the packed blocks with
  block-max pruning (Ding & Suel, SIGIR 2011). Blocks for the query's terms
  are pruned by the parquet ``term`` predicate (a handful of rows per term),
  fetched, and walked with numpy decode — the classic top-k engine shape.

* ``search_wand_distributed`` — the cluster path: the SAME cursor walk runs
  inside ``applyInPandas`` grouped by the index's ``part`` buckets (disjoint
  sorted doc-id ranges by construction — build.py:15-28), each bucket
  emitting its local exact top-k, and the driver merges ≤ parts·k tiny rows.
  Nothing bigger than (num_parts × k) rows ever reaches the driver — a hot
  term's gigabytes of blocks stay on the executors. Exactness: per-part WAND
  with θ=-inf is exact within the part (less pruning than a shared θ, never
  less correct), parts partition the doc space, and per-doc float summation
  runs in ascending-term order in both paths, so ranks AND scores are
  bit-identical to the driver walk (asserted in tests/test_index.py).
"""

from __future__ import annotations

import heapq
import math
import os
import re
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import tokenize
from .build import IndexPaths
from .codec import (delta_decode, unpack_block, unpack_positions,
                    varbyte_decode)

K1 = 1.2
B = 0.75


class IndexReader:
    """Query-side handle on an index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        # Per-instance relation cache: repeated reads of the same index
        # table within this reader's lifetime (a multi-step query like
        # collate = termstats presence + suggestion + search) reuse one
        # DataFrame instead of re-listing files and re-reading footers per
        # call. A reader is already snapshot-scoped (stats are cached at
        # construction), so this adds no new staleness class — mutation
        # paths construct fresh readers.
        self._df_cache: dict[str, DataFrame] = {}
        row = spark.read.parquet(self.paths.stats).collect()[0]
        self.n_docs = row["n_docs"]
        self.avgdl = float(row["avgdl"])
        # tombstones (index/maintain.delete_docs): Lucene deleted-docs
        # semantics — a visibility filter at query time; stats/df keep
        # counting deleted docs until a rebuild, like segments before merge.
        # Held as a sorted numpy array (np.searchsorted membership); at
        # 10^12-doc scale this becomes a roaring bitmap broadcast.
        self._tomb_path = os.path.join(self.paths.root, "tombstones")
        if os.path.exists(self._tomb_path):
            rows = spark.read.parquet(self._tomb_path).select("doc_id").distinct().collect()
            self.tombstones = np.sort(np.array([r["doc_id"] for r in rows],
                                               dtype=np.int64))
        else:
            self.tombstones = np.array([], dtype=np.int64)
        # Broadcast once: executor-side tasks (search_wand_distributed) pull
        # the set from the broadcast store instead of shipping it inside
        # every task closure — task size stays O(1) in tombstone count.
        self._tomb_bc = spark.sparkContext.broadcast(self.tombstones)

    def _read(self, path: str) -> DataFrame:
        """Cached parquet relation for one of this index's tables (see
        ``_df_cache`` in ``__init__``)."""
        df = self._df_cache.get(path)
        if df is None:
            df = self.spark.read.parquet(path)
            self._df_cache[path] = df
        return df

    # -- statistics --------------------------------------------------------

    def term_stats(self, terms: list[str]) -> dict[str, dict]:
        """ONE termstats scan for everything a query needs per term:
        ``{"df": int, "bytes": int | None}`` (bytes = packed block payload
        size, from build-time block metadata; None on a pre-r4 index).
        ``search()`` fetches this once and derives idfs + the fetch-cost
        routing estimate from it — never two scans per query."""
        if not terms:
            return {}
        ts = self._read(self.paths.termstats)
        has_bytes = "bytes" in ts.columns
        cols = ["term", "df"] + (["bytes"] if has_bytes else [])
        rows = ts.filter(F.col("term").isin(terms)).select(*cols).collect()
        # Per-row nullability: after append_documents runs current code on a
        # pre-r4 index, recomputed termstats (F.sum over blocks where old
        # files lack bin_bytes) yields NULL bytes for terms living only in
        # old blocks — search() handles bytes=None via the postings-count
        # routing fallback, so surface None instead of crashing on int(None).
        return {
            r["term"]: {"df": int(r["df"]),
                        "bytes": int(r["bytes"])
                        if has_bytes and r["bytes"] is not None else None}
            for r in rows
        }

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        return {t: s["df"] for t, s in self.term_stats(terms).items()}

    def _idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def idfs(self, terms: list[str]) -> dict[str, float]:
        return {t: self._idf(s["df"])
                for t, s in self.term_stats(terms).items()}

    # -- exhaustive scorer (DataFrame plan) ---------------------------------

    def postings_view(self, terms: list[str] | None = None) -> DataFrame:
        """The (term, doc_id, tf, dl) relation: the persisted postings table
        when present, else a narrow vectorized decode of the blocks (the
        blocks ARE the postings — the table is an optional debug artifact).

        Pass ``terms`` to prune: on the postings table it's an ordinary
        pushed filter, but on the blocks-decode branch it must be applied
        BELOW the ``mapInPandas`` boundary (a filter above a Python UDF
        never reaches the parquet scan), so the pruning happens on the
        block scan itself — only the query terms' packed blocks are ever
        read or decoded."""
        if os.path.exists(self.paths.postings):
            df = self._read(self.paths.postings)
            return df.filter(F.col("term").isin(terms)) if terms else df
        blocks = self._read(self.paths.blocks)
        if terms:
            blocks = blocks.filter(F.col("term").isin(terms))
        return blocks.select("term", "ids_bin", "tfs_bin", "dls_bin").mapInPandas(
            _decode_blocks_stream, schema="term string, doc_id long, tf long, dl long"
        )

    def score_exhaustive(
        self, query: str, k: int | None = 10, *, mode: str = "or",
        where: str | None = None,
    ) -> DataFrame:
        """Declarative BM25 over the postings relation; k=None scores all.

        ``mode="and"`` keeps only docs containing EVERY query term (strict
        Lucene +required: a term absent from the index matches nothing) —
        same scores, conjunctive candidate set. ``where`` is a SQL predicate
        over the docstore (the reference's fq filters, Q-2/Q-3, COMBINED
        with relevance ranking): scores are unchanged, visibility is
        restricted — Solr/Lucene fq semantics (non-scoring filter)."""
        terms = sorted(set(tokenize(query)))
        idfs = self.idfs(terms)
        if not idfs:
            return self.spark.createDataFrame([], "doc_id long, score double")
        idf_map = F.create_map(
            *[F.lit(x) for t, v in sorted(idfs.items()) for x in (t, float(v))]
        )
        postings = self.postings_view(sorted(idfs))
        contrib = (
            F.element_at(idf_map, F.col("term"))
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / F.lit(self.avgdl))
            )
        )
        scored = (
            postings
            .select("doc_id", "term", contrib.alias("contrib"))
            .groupBy("doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("score"),
                F.count("*").alias("_nterms"),
            )
        )
        if mode == "and":
            # strict +required: if any query term is absent from the index
            # no doc can reach len(terms) matches → empty result
            scored = scored.filter(F.col("_nterms") == len(terms))
        elif mode != "or":
            raise ValueError(f"unknown mode: {mode!r}")
        scored = scored.drop("_nterms")
        if where is not None:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("doc_id")
            )
            scored = scored.join(visible, "doc_id", "left_semi")
        if len(self.tombstones):
            # anti-join (not isin): the tombstone set stays distributed
            tomb = self._read(self._tomb_path).select("doc_id").distinct()
            scored = scored.join(tomb, "doc_id", "left_anti")
        out = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k is not None else out

    # -- block-max WAND ------------------------------------------------------

    def fetch_blocks(
        self, terms: list[str], with_positions: bool = False,
    ) -> dict[str, list]:
        blocks = self._read(self.paths.blocks)
        cols = ["term", "first_doc_id", "last_doc_id", "n", "max_tf",
                "dl_min", "ids_bin", "tfs_bin", "dls_bin"]
        if with_positions:
            if "pos_bin" not in blocks.columns:
                raise ValueError(
                    "not a positional index: rebuild with "
                    "build_index(positions=True) for phrase queries")
            cols.append("pos_bin")
        rows = (
            blocks.filter(F.col("term").isin(terms)).select(*cols).collect()
        )
        if with_positions and any(r["pos_bin"] is None for r in rows):
            # the pos_bin COLUMN always exists (BLOCK_SCHEMA); only its
            # payload tells a positional build from a bag-of-words one
            raise ValueError(
                "not a positional index: rebuild with "
                "build_index(positions=True) for phrase queries")
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        for t in by_term:
            by_term[t].sort(key=lambda r: r["first_doc_id"])
        return by_term

    def allowed_ids(self, where: str | None) -> np.ndarray | None:
        """SQL predicate over the docstore → sorted visible doc_id set (the
        fq filter surface of the DRIVER walk only).

        This collects the visible ids to the driver, so it is only safe
        where the driver walk itself is: a small index / debug path.
        ``search()`` routes every filtered query to the distributed walk,
        which evaluates the predicate executor-side (cogrouped per part —
        see :meth:`search_wand_distributed`) and never materializes the
        visible-id set on the driver, matching Solr fq semantics of
        evaluating filters inside the index (SolrClient.java:144-163)."""
        if where is None:
            return None
        rows = (
            self._read(self.paths.docstore)
            .filter(where).select("doc_id").collect()
        )
        return np.sort(np.array([r["doc_id"] for r in rows], dtype=np.int64))

    def search_wand(
        self, query: str, k: int = 10, *, mode: str = "or",
        where: str | None = None, _idfs: dict[str, float] | None = None,
        after: tuple[int, float] | None = None,
    ) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(query)))
        idfs = self.idfs(terms) if _idfs is None else _idfs
        if not idfs:
            return []
        allowed = self.allowed_ids(where)
        blocks = self.fetch_blocks(list(idfs))
        cursors = [
            _Cursor(t, idfs[t], blocks[t], self.avgdl)
            for t in sorted(idfs) if t in blocks
        ]
        if mode == "and":
            # strict Lucene +required semantics: EVERY query term is
            # required, so a term absent from the index matches nothing
            return _and_topk(cursors, k, len(terms),
                             deleted=self.tombstones, allowed=allowed,
                             after=after)
        if mode != "or":
            raise ValueError(f"unknown mode: {mode!r}")
        return _wand_topk(cursors, k, deleted=self.tombstones, allowed=allowed,
                          after=after)

    def search_phrase(
        self, phrase: str, k: int = 10, *, where: str | None = None,
        distributed: bool | None = None, slop: int = 0,
    ) -> list[tuple[int, float]]:
        """Exact-phrase top-k over a POSITIONAL index (Q-9 extension; the
        capability delta VERDICT r4 ranked #2 — Lucene phrase queries work
        out-of-the-box on its positional postings, SolrClient.java:125-201
        serves them; this closes that gap engine-side).

        Semantics = Lucene ``PhraseQuery`` (slop 0): a doc matches iff the
        exact consecutive token sequence occurs; ``pf`` = number of phrase
        occurrences; score = (Σ_i idf(t_i), summed WITH multiplicity over
        the phrase's token sequence — Lucene sums the idf explanation the
        same way) · pf/(pf + k1·(1 − b + b·dl/avgdl)). Every phrase term is
        required, so an index-absent term matches nothing. Tie-break
        (score desc, doc_id asc); tombstones + optional fq ``where`` as in
        :meth:`search_wand`.

        ``slop`` (the classic parser's ``"a b"~N``) relaxes matching to
        ORDERED near-match — Lucene SpanNearQuery(inOrder=true, slop)
        semantics, NOT classic PhraseQuery's transposing sloppy scorer:
        a match is an in-order occurrence of all phrase terms with at
        most ``slop`` intervening positions total, pf counts match start
        positions unweighted (vs Lucene's 1/(distance+1) weights). Both
        deviations documented; :func:`_phrase_freq` defines the contract
        and the DuckDB oracle restates it (``bm25_phrase_slop``).

        ``distributed=None`` auto-routes like :meth:`search`: the per-part
        executor walk (:meth:`search_phrase_distributed`) unless the
        estimated fetch volume is driver-walk small; filtered queries
        always route distributed so the fq set stays executor-side. (The
        byte estimate is the CORE payload — a positional fetch is ~1.2×
        that, so routing leans driver slightly; acceptable, the threshold
        is an order-of-magnitude knob.) The route taken is recorded in
        ``self.last_path``.

        Plan shape (driver walk): the conjunctive leapfrog of
        :func:`_and_topk` over the DISTINCT terms' cursors (docs failing
        the AND intersection never decode positions), then a position-list
        intersection (:func:`_phrase_freq`) only at aligned docs —
        positions stream lazily per block, nothing but the phrase terms'
        blocks is read."""
        terms = tokenize(phrase)  # in order, duplicates kept
        if not terms or k <= 0:
            return []
        uniq = sorted(set(terms))
        stats = self.term_stats(uniq)
        if any(t not in stats for t in uniq):
            return []
        idfs = {t: self._idf(stats[t]["df"]) for t in uniq}
        idf_sum = sum(idfs[t] for t in terms)
        if distributed is None:
            if where is not None:
                distributed = True
            elif all(s["bytes"] is not None for s in stats.values()):
                distributed = (sum(s["bytes"] for s in stats.values())
                               > self.DISTRIBUTED_FETCH_BYTES)
            else:
                distributed = (sum(s["df"] for s in stats.values())
                               > self.DISTRIBUTED_POSTINGS_THRESHOLD)
        self.last_path = "distributed" if distributed else "driver"
        if distributed:
            return self._phrase_walk_distributed(
                terms, uniq, idfs, idf_sum, k, where, slop)
        allowed = self.allowed_ids(where)
        blocks = self.fetch_blocks(uniq, with_positions=True)
        if any(t not in blocks for t in uniq):
            return []
        cursors = {
            t: _Cursor(t, idfs[t], blocks[t], self.avgdl)
            for t in uniq
        }
        return _phrase_topk(terms, cursors, idf_sum, k, self.avgdl,
                            deleted=self.tombstones, allowed=allowed,
                            slop=slop)

    def search_phrase_distributed(
        self, phrase: str, k: int = 10, *, where: str | None = None,
        slop: int = 0,
    ) -> list[tuple[int, float]]:
        """Exact-phrase top-k with the position-list leapfrog ON THE
        EXECUTORS — the cluster-scale phrase shape, mirroring
        :meth:`search_wand_distributed`: one ``applyInPandas`` group per
        index ``part`` bucket (disjoint doc-id ranges, so phrase matching
        is bucket-local), exact local top-k per bucket, driver merge of
        ≤ parts·k rows. ``where`` is evaluated executor-side via the same
        part-cogrouped docstore scan. Rank- and score-identical to the
        driver walk (asserted in tests)."""
        terms = tokenize(phrase)
        if not terms or k <= 0:
            return []
        uniq = sorted(set(terms))
        stats = self.term_stats(uniq)
        if any(t not in stats for t in uniq):
            return []
        idfs = {t: self._idf(stats[t]["df"]) for t in uniq}
        idf_sum = sum(idfs[t] for t in terms)
        return self._phrase_walk_distributed(terms, uniq, idfs, idf_sum,
                                             k, where, slop)

    def _require_positional(self) -> None:
        """Raise unless the blocks carry real positional payloads (cached
        per reader — one limit-1 metadata probe, then free)."""
        if getattr(self, "_positional", None) is None:
            blocks = self._read(self.paths.blocks)
            if "pos_bin" not in blocks.columns:
                self._positional = False
            else:
                # an index is uniformly positional or not (build sets it,
                # append auto-detects and preserves it), so ONE row decides
                # — never a full-column null scan at 100-TB block scale
                row = blocks.select("pos_bin").limit(1).collect()
                self._positional = bool(row) and row[0]["pos_bin"] is not None
        if not self._positional:
            raise ValueError(
                "not a positional index: rebuild with "
                "build_index(positions=True) for phrase queries")

    def _phrase_walk_distributed(
        self, terms: list[str], uniq: list[str], idfs: dict[str, float],
        idf_sum: float, k: int, where: str | None, slop: int = 0,
    ) -> list[tuple[int, float]]:
        self._require_positional()
        avgdl = self.avgdl
        tomb_bc = self._tomb_bc
        blocks = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(uniq))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin",
                    "pos_bin")
        )

        def _walk(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
            if allow is not None and len(allow) == 0:
                return empty
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            if any(t not in by_term for t in uniq):
                return empty  # bucket lacks a required term: no phrase hit
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            cursors = {
                t: _Cursor(t, idfs[t], by_term[t], avgdl) for t in uniq
            }
            hits = _phrase_topk(terms, cursors, idf_sum, k, avgdl,
                                deleted=tomb_bc.value, allowed=allow,
                                slop=slop)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in hits],
                 "score": [s for _, s in hits]},
                columns=["doc_id", "score"],
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "doc_id long, score double"
        if where is None:
            local = blocks.groupBy("part").applyInPandas(
                lambda pdf: _walk(pdf, None), schema=out_schema
            ).collect()
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk(bl_pdf, allow)

            local = (
                blocks.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_filtered, schema=out_schema)
                .collect()
            )
        merged = sorted(local, key=lambda r: (-r["score"], r["doc_id"]))[:k]
        return [(int(r["doc_id"]), float(r["score"])) for r in merged]

    def postings_view_positional(self, terms: list[str]) -> DataFrame:
        """(term, doc_id, tf, dl, positions) decoded from the packed blocks
        for the given terms — the declarative substrate for
        :meth:`score_phrase_exhaustive` (narrow vectorized decode, pruned
        to the phrase's terms by the parquet ``term`` predicate)."""
        self._require_positional()
        blocks = self._read(self.paths.blocks)
        src = blocks.filter(F.col("term").isin(terms)).select(
            "term", "ids_bin", "tfs_bin", "dls_bin", "pos_bin")
        return src.mapInPandas(
            _decode_blocks_pos_stream,
            schema="term string, doc_id long, tf long, dl long, "
                   "positions array<int>",
        )

    def score_phrase_exhaustive(
        self, phrase: str, k: int | None = 10, *, where: str | None = None,
    ) -> DataFrame:
        """Declarative oracle twin of :meth:`search_phrase`: decode the
        phrase terms' positional postings, slide each phrase slot i to its
        start position (pos − i), count per-doc aligned starts (= phrase
        frequency) via successive equi-joins, score once per doc. Identity
        with the walk is asserted in tests/test_index.py."""
        terms = tokenize(phrase)
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            return empty
        uniq = sorted(set(terms))
        stats = self.term_stats(uniq)
        if any(t not in stats for t in uniq):
            return empty
        idf_sum = sum(self._idf(stats[t]["df"]) for t in terms)
        pv = self.postings_view_positional(uniq)
        matched = None
        for i, t in enumerate(terms):
            # NB: the transform lambda must take ONE parameter — a second
            # parameter (even defaulted) makes PySpark bind it to the array
            # ELEMENT INDEX, silently shadowing the slot offset. The Column
            # expression is built eagerly, so capturing `shift` is safe.
            shift = F.lit(i)
            slot = pv.filter(F.col("term") == t).select(
                "doc_id",
                *(["dl"] if i == 0 else []),
                F.explode(
                    F.transform("positions", lambda p: p - shift)
                ).alias("p"),
            )
            matched = slot if matched is None else matched.join(
                slot, ["doc_id", "p"])
        pf = matched.groupBy("doc_id", "dl").agg(
            F.count("*").cast("double").alias("pf"))
        score = (
            F.lit(float(idf_sum)) * F.col("pf")
            / (F.col("pf") + F.lit(K1) * (
                F.lit(1.0) - F.lit(B)
                + F.lit(B) * F.col("dl") / F.lit(self.avgdl)))
        )
        scored = pf.select("doc_id", score.alias("score"))
        if where is not None:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("doc_id")
            )
            scored = scored.join(visible, "doc_id", "left_semi")
        if len(self.tombstones):
            tomb = self._read(self._tomb_path).select(
                "doc_id").distinct()
            scored = scored.join(tomb, "doc_id", "left_anti")
        out = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k is not None else out

    def search_wand_distributed(
        self, query: str, k: int = 10, *, mode: str = "or",
        where: str | None = None, _idfs: dict[str, float] | None = None,
        after: tuple[int, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Distributed exact top-k with the scorer on the executors.

        One ``applyInPandas`` group per index ``part`` bucket (disjoint doc-id
        ranges), local exact top-k per bucket (the vectorized kernel via
        ``_wand_topk``'s dispatch), driver k-way merge of
        ≤ parts·k rows. Rank- and score-identical to :meth:`search_wand`.
        ``mode="and"`` = conjunctive leapfrog per bucket (a bucket missing a
        term's postings matches nothing — exact).

        ``where`` = fq visibility filter, evaluated entirely executor-side:
        the docstore predicate scan is COGROUPED with the block scan on
        ``part`` (both are hive-partitioned by part, so each bucket's walker
        receives exactly its own visible ids through the shuffle), the way
        Solr evaluates fq inside the index (SolrClient.java:144-163).
        Nothing about the visible-id set ever reaches the driver — for an
        unselective predicate at 10^12-doc scale the per-part id sets stay
        O(docs/parts) on the executors while the driver still sees only
        parts·k result rows."""
        if mode not in ("or", "and"):
            raise ValueError(f"unknown mode: {mode!r}")
        terms = sorted(set(tokenize(query)))
        idfs = self.idfs(terms) if _idfs is None else _idfs
        if not idfs:
            return []
        avgdl = self.avgdl
        n_required = len(terms)  # strict +required: absent term → no hits
        tomb_bc = self._tomb_bc  # Broadcast handle: O(1) in the closure
        blocks = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(list(idfs)))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin")
        )

        def _walk(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )
            if allow is not None and len(allow) == 0:
                return empty  # no visible docs in this part: skip the walk
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            if not by_term:
                return empty  # part has visible docs but no query postings
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            cursors = [
                _Cursor(t, idfs[t], by_term[t], avgdl)
                for t in sorted(by_term)
            ]
            # the same `after` cursor applies verbatim per part: parts hold
            # disjoint doc ids, so "strictly after (s0, d0)" is a pure
            # per-doc predicate and the driver merge of per-part pages is
            # exactly the global page
            if mode == "and":
                hits = _and_topk(cursors, k, n_required,
                                 deleted=tomb_bc.value, allowed=allow,
                                 after=after)
            else:
                hits = _wand_topk(cursors, k, deleted=tomb_bc.value,
                                  allowed=allow, after=after)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in hits], "score": [s for _, s in hits]},
                columns=["doc_id", "score"],
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "doc_id long, score double"
        if where is None:
            local = blocks.groupBy("part").applyInPandas(
                lambda pdf: _walk(pdf, None), schema=out_schema
            ).collect()
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk(bl_pdf, allow)

            local = (
                blocks.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_filtered, schema=out_schema)
                .collect()
            )
        merged = sorted(local, key=lambda r: (-r["score"], r["doc_id"]))[:k]
        return [(int(r["doc_id"]), float(r["score"])) for r in merged]

    def search_many(
        self, queries: dict[str, str], k: int = 10, *, mode: str = "or",
        where: str | None = None,
    ) -> DataFrame:
        """Batch top-k for MANY queries in ONE distributed job — the QPS
        surface for query-set workloads (the reference replays whole query
        sets against Solr; serving a set one job per query pays Spark's
        per-job latency |Q| times).

        ``queries`` maps query_id → query string. One termstats scan fetches
        df for the UNION of all terms; one block scan (pruned to that
        union) feeds the per-part walker, which runs the same exact
        WAND/AND cursor walk once per query over the part's shared block
        rows and emits each query's local top-k. The global merge is a
        window-rank DataFrame job over those ≤ parts·k·|Q| rows — nothing
        funnels through the driver, so a 100k-query offline replay scales
        with the cluster. ``where`` uses the same cogrouped executor-side
        fq evaluation as :meth:`search_wand_distributed`.

        Returns (query_id, doc_id, score, rank) — per query rank- and
        score-identical to :meth:`search_wand` (asserted in tests)."""
        if mode not in ("or", "and"):
            raise ValueError(f"unknown mode: {mode!r}")
        q_terms = {qid: sorted(set(tokenize(q))) for qid, q in queries.items()}
        all_terms = sorted({t for ts in q_terms.values() for t in ts})
        idfs = {t: self._idf(s["df"])
                for t, s in self.term_stats(all_terms).items()}
        live_terms = [t for t in all_terms if t in idfs]
        if not live_terms:
            return self.spark.createDataFrame(
                [], "query_id string, doc_id long, score double, rank int")
        avgdl = self.avgdl
        tomb_bc = self._tomb_bc
        n_required = {qid: len(ts) for qid, ts in q_terms.items()}
        blocks = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(live_terms))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin")
        )

        def _walk_many(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame({
                "query_id": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            })
            if allow is not None and len(allow) == 0:
                return empty
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            if not by_term:
                return empty
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            # decode each term's blocks ONCE for the whole query set (the
            # per-query cursor construction re-decoded shared terms |Q|
            # times); every query then scores through the vectorized exact
            # kernel over the shared arrays — identical hits to the cursor
            # walks (same fold order: ascending term, same masks/tie-break)
            arrs = {t: _decode_term_arrays(bl) for t, bl in by_term.items()}
            out_q, out_d, out_s = [], [], []
            for qid, ts in q_terms.items():
                present = [t for t in ts if t in arrs]  # ts sorted asc
                if not present:
                    continue
                units = [(idfs[t], *arrs[t]) for t in present]
                if mode == "and":
                    if len(present) < n_required[qid]:
                        continue  # a required term has no postings here
                    hits = _vec_topk([[u] for u in units], [], k, avgdl,
                                     deleted=tomb_bc.value, allowed=allow)
                else:
                    hits = _vec_topk([], units, k, avgdl,
                                     deleted=tomb_bc.value, allowed=allow)
                for d, s in hits:
                    out_q.append(qid)
                    out_d.append(d)
                    out_s.append(s)
            return pd.DataFrame(
                {"query_id": out_q, "doc_id": out_d, "score": out_s},
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "query_id string, doc_id long, score double"
        if where is None:
            local = blocks.groupBy("part").applyInPandas(
                lambda pdf: _walk_many(pdf, None), schema=out_schema
            )
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_many_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk_many(bl_pdf, allow)

            local = (
                blocks.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_many_filtered, schema=out_schema)
            )
        # The global per-query merge is a DataFrame job, NOT a driver
        # collect: a 100k-query offline replay at 64 parts × k=10 would
        # otherwise funnel 64M rows through one driver. Parts hold disjoint
        # doc-id ranges so every (query_id, doc_id) pair appears at most
        # once — row_number over (score desc, doc_id asc) is exactly the
        # k-way merge the driver used to do, and the tiny shuffle moves
        # only ≤ parts·k rows per query.
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id"))
        return (
            local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def _check_facet_fields(self, fields: list[str]) -> None:
        """Fail fast on the driver for field lists the pandas kernels
        cannot express (duplicates collapse a groupby; part/doc_id collide
        with the kernel's own columns)."""
        if len(set(fields)) != len(fields):
            raise ValueError(f"duplicate facet fields: {fields}")
        bad = set(fields) & {"part", "doc_id"}
        if bad:
            raise ValueError(
                f"facet fields collide with index columns: {sorted(bad)}")

    def _matchset_partials(self, query: str, mode: str, where: str | None,
                           fields: list[str], partial, out_schema: str):
        """The shared match-set ∩ metadata plan under facet_counts AND
        facet_pivot: pruned docstore scan (fq predicate + requested fields
        cast to string), ids-only block decode cogrouped per part, numpy
        membership mask handed to ``partial(doc_pdf, matched)`` which
        emits that part's PARTIAL count rows. Returns the partial-counts
        DataFrame, or None when the query provably matches nothing (a
        term absent from the index in and-mode / no query term indexed) —
        callers return their empty shape."""
        terms = sorted(set(tokenize(query))) if query not in ("", "*:*") \
            else []
        docmeta = self._read(self.paths.docstore)
        if where is not None:
            docmeta = docmeta.filter(where)
        docmeta = docmeta.select(
            "part", "doc_id", *[F.col(c).cast("string").alias(c)
                                for c in fields])
        if not terms:
            # match-all browse: one pruned docstore pass, partial counts
            # per partition, tiny final agg
            return docmeta.groupBy("part").applyInPandas(
                lambda pdf: partial(pdf, None), schema=out_schema)
        stats = self.term_stats(terms)
        if (not stats) or (mode == "and" and len(stats) < len(terms)):
            return None
        n_req = len(terms)
        blocks = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(sorted(stats)))
            .select("part", "term", "ids_bin")
        )

        def _kernel(bl_pdf, doc_pdf):
            per_term: dict[str, list] = {}
            for rec in bl_pdf.to_dict("records"):
                ids = delta_decode(varbyte_decode(bytes(rec["ids_bin"])))
                per_term.setdefault(rec["term"], []).append(ids)
            if mode == "and" and len(per_term) < n_req:
                return partial(doc_pdf.iloc[0:0], None)
            sets = [np.unique(np.concatenate(v))
                    for v in per_term.values()]
            if not sets:
                return partial(doc_pdf.iloc[0:0], None)
            matched = sets[0]
            if mode == "and":
                for st in sets[1:]:
                    matched = np.intersect1d(matched, st,
                                             assume_unique=True)
            else:
                matched = np.unique(np.concatenate(sets)) \
                    if len(sets) > 1 else sets[0]
            return partial(doc_pdf, matched)

        return (
            blocks.groupBy("part")
            .cogroup(docmeta.groupBy("part"))
            .applyInPandas(_kernel, schema=out_schema)
        )

    def facet_counts(
        self, query: str, fields: list[str], *, mode: str = "or",
        where: str | None = None, top: int = 10,
    ) -> DataFrame:
        """Solr-style facet counts over the FULL match set of ``query``
        (the serving surface the reference's index exists to power: Collex
        is a faceted browser, and every Solr response it consumes carries
        ``facet.field`` counts alongside the hits — facets summarize ALL
        matching docs, not the top-k page).

        ``fields`` are docstore metadata columns (``build_index
        meta_cols`` — the index's stored fields, like Lucene doc values).
        ``mode="or"`` matches docs containing ANY query term, ``"and"``
        requires every term (strict ``+required``: a term absent from the
        index ⇒ empty). An empty/``"*:*"`` query matches ALL visible docs
        (Solr ``q=*:*`` browsing). ``where`` is the same fq predicate as
        :meth:`search`, evaluated on the docstore scan. Tombstoned docs
        never count.

        Scale shape: blocks and docstore are co-partitioned on the same
        doc_id→part striping, so the match-set ∩ metadata step is a
        COGROUPED per-part kernel — ids-only block decode (no tf/dl), a
        numpy membership mask over the part's (pruned) metadata columns,
        and per-part PARTIAL counts. Only ≤ parts·Σ|field cardinality|
        count rows reach the final groupBy; nothing is proportional to
        corpus size past the scans. Returns (facet_field, facet_value,
        n) — per field the ``top`` values by (n desc, value asc)."""
        if mode not in ("or", "and"):
            raise ValueError(f"unknown mode: {mode!r}")
        if not fields:
            raise ValueError("facet_counts needs at least one field")
        self._check_facet_fields(fields)
        tomb_bc = self._tomb_bc
        out_schema = "facet_field string, facet_value string, cnt long"

        def _partial_counts(doc_pdf, matched: np.ndarray | None):
            """Per-part partial (field, value, count) rows. ``matched`` is
            the part's matching doc_id set (None = match-all)."""
            import pandas as pd

            sub = doc_pdf
            deleted = tomb_bc.value
            if deleted is not None and len(deleted):
                sub = sub[~sub["doc_id"].isin(deleted)]
            if matched is not None:
                sub = sub[np.isin(sub["doc_id"].values.astype(np.int64),
                                  matched)]
            frames = []
            for f_name in fields:
                vc = sub[f_name].value_counts(dropna=False)
                vals = [None if pd.isna(v) else str(v) for v in vc.index]
                frames.append(pd.DataFrame({
                    "facet_field": f_name,
                    "facet_value": pd.Series(vals, dtype="object"),
                    "cnt": vc.values.astype("int64"),
                }))
            return pd.concat(frames, ignore_index=True) if frames else \
                pd.DataFrame({"facet_field": pd.Series(dtype="object"),
                              "facet_value": pd.Series(dtype="object"),
                              "cnt": pd.Series(dtype="int64")})

        partial = self._matchset_partials(query, mode, where, fields,
                                          _partial_counts, out_schema)
        if partial is None:
            return self.spark.createDataFrame([], out_schema).select(
                "facet_field", "facet_value", F.col("cnt").alias("n"))
        from pyspark.sql import Window

        w = Window.partitionBy("facet_field").orderBy(
            F.desc("n"), F.asc_nulls_last("facet_value"))
        return (
            partial.groupBy("facet_field", "facet_value")
            .agg(F.sum("cnt").alias("n"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= top)
            .drop("_r")
        )

    def more_like_this(
        self, text: str, k: int = 10, *, m_terms: int = 10,
        min_tf: int = 1, where: str | None = None,
        exclude_doc_id: int | None = None,
    ) -> list[tuple[int, float]]:
        """Lucene/Solr MoreLikeThis: rank the corpus by similarity to a
        given document's text. Select the document's ``m_terms`` most
        "interesting" terms — tf(term in doc) · idf(term), Lucene MLT's
        default scorer, ties broken (score desc, term asc), terms absent
        from the index or below ``min_tf`` dropped — then run the standard
        OR-mode BM25 search with them. ``exclude_doc_id`` drops the seed
        from a k+1 overfetch (Solr MLT never returns the seed).

        The seed analysis is a driver-side tokenize of ONE document plus
        one termstats scan (df for the seed's distinct terms); the search
        itself is the normal auto-routed WAND walk, so the heavy part
        inherits the distributed shape. Seed exclusion is a k+1
        overfetch + post-drop, NOT an fq predicate: the fq path scans the
        docstore to build the visible set, which is the right shape for a
        real ``where`` but absurd for excluding one known id (the top-k
        of corpus−seed is exactly the top-k+1 of the corpus minus the
        seed row). ``where`` still routes through fq when given."""
        counts: dict[str, int] = {}
        for t in tokenize(text):
            counts[t] = counts.get(t, 0) + 1
        cand = sorted(t for t, c in counts.items() if c >= min_tf)
        if not cand:
            return []
        stats = self.term_stats(cand)
        scored = sorted(
            ((counts[t] * self._idf(s["df"]), t) for t, s in stats.items()),
            key=lambda x: (-x[0], x[1]),
        )
        top_terms = [t for _, t in scored[:m_terms]]
        self.last_mlt_terms = top_terms
        if not top_terms:
            return []
        if exclude_doc_id is None:
            return self.search_wand_distributed(
                " ".join(top_terms), k, where=where)
        hits = self.search_wand_distributed(
            " ".join(top_terms), k + 1, where=where)
        return [h for h in hits if h[0] != int(exclude_doc_id)][:k]

    def suggest(
        self, term: str, *, max_dist: int = 2, top: int = 5,
        min_df: int = 1,
    ) -> DataFrame:
        """Spell suggestion over the index's term dictionary — Lucene's
        DirectSpellChecker shape (Solr ``spellcheck``): candidate terms
        within ``max_dist`` Levenshtein edits of the input, ranked
        (distance asc, df desc, term asc). The input term itself is never
        suggested; ``min_df`` drops noise terms.

        Scale shape: ONE scan of the termstats metadata table (|vocab|
        rows — millions, not trillions; no postings touched), a length
        band prefilter (|len(t) − len(term)| ≤ max_dist, cheap Column
        algebra that skips most of the dictionary before the edit-distance
        kernel), JVM-side ``levenshtein``, and a global top-N — the only
        thing that moves is ``top`` rows. Returns (term, df, dist)."""
        q = term.strip().lower()
        out_schema = "term string, df long, dist int"
        if not q:
            return self.spark.createDataFrame([], out_schema)
        ts = self._read(self.paths.termstats)
        return (
            ts.select("term", "df")
            .filter(
                (F.abs(F.length("term") - F.lit(len(q))) <= max_dist)
                & (F.col("term") != q)
                & (F.col("df") >= min_df)
            )
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
            .filter(F.col("dist") <= max_dist)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(top)
        )

    def search_collated(
        self, query: str, k: int = 10, *, max_dist: int = 2,
        mode: str = "or", where: str | None = None,
    ) -> tuple[str, list[tuple[int, float]]]:
        """Solr ``spellcheck.collate``: rewrite each query term that is
        ABSENT from the index with its top spell suggestion (the
        :meth:`suggest` ranking — distance asc, df desc, term asc), then
        serve the corrected query. Returns ``(collated_query, hits)``;
        terms with no candidate within ``max_dist`` stay as typed (they
        simply match nothing, like Solr serving the raw collation).

        Scale shape: ONE termstats scan answers BOTH df-presence for every
        query term AND each term's top suggestion ((dist asc, df desc,
        term asc) as a lexicographic struct-min; the tiny query-term list
        is broadcast against the dictionary scan, length-band + distance
        filtered) — one metadata job + the search regardless of how many
        typos the query carries. Suggestions are applied only to terms the
        presence bit marks unknown, so the rewrite is identical to the
        two-scan formulation."""
        toks = tokenize(query)
        uniq = sorted(set(toks))
        repl: dict[str, str] = {}
        if uniq:
            cand = self.spark.createDataFrame(
                [(t,) for t in uniq], "input string")
            ts = self._read(self.paths.termstats).select("term", "df")
            pair = ts.crossJoin(F.broadcast(cand)).filter(
                (F.col("term") == F.col("input"))
                | ((F.abs(F.length("term") - F.length("input")) <= max_dist)
                   & (F.col("df") >= 1))
            ).withColumn(
                "dist",
                F.when(F.col("term") == F.col("input"), F.lit(-1))
                .otherwise(F.levenshtein("term", "input")),
            ).filter(F.col("dist") <= max_dist)
            rows = pair.groupBy("input").agg(
                F.max(F.when(F.col("dist") == -1, 1).otherwise(0))
                .alias("present"),
                # lexicographic struct-min == (dist asc, df desc, term asc)
                F.min(F.when(F.col("dist") >= 0, F.struct(
                    "dist", (-F.col("df")).alias("ndf"), "term")))
                .alias("best"),
            ).collect()
            repl = {
                r["input"]: r["best"]["term"] for r in rows
                if not r["present"] and r["best"] is not None
            }
        collated = " ".join(repl.get(t, t) for t in toks)
        hits = self.search_wand_distributed(collated, k, mode=mode,
                                            where=where)
        return collated, hits

    MAX_WILDCARD_EXPANSIONS = 128
    MAX_FUZZY_EXPANSIONS = 50  # Lucene FuzzyQuery's maxExpansions default

    def expand_wildcard(
        self, pattern: str, *, max_expansions: int | None = None,
    ) -> list[str]:
        """Expand a Lucene wildcard pattern (``*``/``?``) against the term
        dictionary: the substrate of ``search_lucene``'s WildcardQuery
        support under the SCORING_BOOLEAN_REWRITE (each expanded term
        scores with its own idf), capped deterministically at the
        ``max_expansions`` highest-df terms (ties term-asc) — Lucene's
        TopTermsRewrite posture without the 1024-clause blowup.

        Scale shape: ONE termstats scan (vocab-sized, no postings). A
        literal prefix before the first wildcard becomes a
        ``startswith`` predicate (parquet-pushable ``StringStartsWith``
        — the dictionary scan prunes by row-group range like Lucene's
        FST prefix seek) with the full anchored regex as the residual."""
        rows = self.expand_wildcard_df(
            pattern, max_expansions=max_expansions).collect()
        return [r["term"] for r in rows]

    def expand_wildcard_df(
        self, pattern: str, *, max_expansions: int | None = None,
    ) -> DataFrame:
        """The declarative dictionary-expansion plan behind
        :meth:`expand_wildcard` (exposed so the plan-audit suite can
        assert the ``StringStartsWith`` prefix predicate reaches the
        parquet scan)."""
        from .qparse import wildcard_regex

        cap = max_expansions or self.MAX_WILDCARD_EXPANSIONS
        pat = pattern.lower()
        rx = wildcard_regex(pat)
        ts = self._read(self.paths.termstats)
        cond = F.col("term").rlike(rx)
        prefix = re.split(r"[*?]", pat, maxsplit=1)[0]
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        return (
            ts.select("term", "df").filter(cond)
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(cap)
        )

    def expand_fuzzy(
        self, term: str, max_edits: int = 2, *,
        max_expansions: int | None = None,
    ) -> list[str]:
        """Expand a fuzzy term (``term~N``) against the term dictionary:
        candidate terms within ``max_edits`` CLASSIC Levenshtein edits
        (transpositions cost 2 — deviation from Lucene's default
        ``transpositions=true``, documented in qparse), the exact term
        included when indexed (distance 0, as Lucene's FuzzyQuery does).
        Capped deterministically at ``max_expansions`` by (distance asc,
        df desc, term asc) — the TopTerms shape of Lucene's fuzzy rewrite
        with a plain-df rank instead of blended boosts (deviation
        documented; each expanded term then scores with its own idf).

        Scale shape: ONE termstats scan with the same length-band
        prefilter as :meth:`suggest` (Column algebra skips most of the
        dictionary before the JVM levenshtein kernel)."""
        cap = max_expansions or self.MAX_FUZZY_EXPANSIONS
        q = term.lower()
        ts = self._read(self.paths.termstats)
        rows = (
            ts.select("term", "df")
            .filter(F.abs(F.length("term") - F.lit(len(q))) <= max_edits)
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
            .filter(F.col("dist") <= max_edits)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(cap).collect()
        )
        return [r["term"] for r in rows]

    def search_boolean(
        self, must: list[str] = (), should: list[str] = (),
        must_not: list[str] = (), *, boosts: dict[str, float] | None = None,
        k: int = 10, where: str | None = None,
        distributed: bool | None = None, min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """Lucene BooleanQuery under BM25 (the full Solr ``q`` clause
        algebra short of phrases): MUST terms gate the match set
        (strict — a MUST term absent from the index matches nothing),
        SHOULD terms add score when present (a pure-SHOULD query is the
        ordinary OR search), MUST_NOT terms exclude their docs (Lucene
        MUST_NOT: a pure-negative query matches nothing), and ``boosts``
        scales a term's idf (Solr ``term^2.5``). Modern Lucene's
        BM25Similarity has no coord() factor and neither does this.

        ``min_should_match`` = Lucene's minimumNumberShouldMatch (Solr
        dismax ``mm``): a matching doc must additionally align at least
        that many SHOULD clauses — one clause per DISTINCT should term
        after analysis (our dedup rule), clauses counted whether or not
        the term is indexed (an unindexed clause can never match, so
        ``mm`` > index-present clauses matches nothing, Lucene's rule).
        Pure-SHOULD queries with ``mm`` > 1 run the exact counting OR
        walk (:func:`_or_topk` — Lucene's own MinShouldMatchSumScorer
        also forgoes WAND there); ``mm`` ≤ 1 keeps block-max pruning.

        MUST_NOT at scale: the prohibited terms' postings are decoded
        ids-only WHERE THE WALK RUNS — per part bucket on the executors in
        the distributed path — and merged into the walker's deleted set;
        the exclusion set never crosses the network (each part only ever
        sees its own stripe's prohibited ids). ``where`` composes as the
        usual fq predicate. Auto-routing follows :meth:`search`:
        byte-estimate guard, filtered queries always distributed."""
        norm = lambda xs: [t for x in xs for t in tokenize(x)]  # noqa: E731
        must_t = sorted(set(norm(must)))
        must_not_t = sorted(set(norm(must_not)))
        should_t = sorted(set(norm(should)) - set(must_t))
        if not must_t and not should_t:
            return []
        scored_terms = sorted(set(must_t) | set(should_t))
        # ONE termstats scan covers scored AND prohibited terms: the
        # driver path fetches MUST_NOT postings too (ids-only, but the
        # bytes still move), so routing must price them in — a cheap
        # +rare query with a hot "-the" clause belongs on the executors.
        all_stats = self.term_stats(sorted(set(scored_terms)
                                           | set(must_not_t)))
        stats = {t: s for t, s in all_stats.items() if t in set(scored_terms)}
        if any(t not in stats for t in must_t):
            return []  # strict +required: an unindexed MUST term → ∅
        boosts = boosts or {}
        idfs = {t: self._idf(s["df"]) * float(boosts.get(t, 1.0))
                for t, s in stats.items()}
        if not idfs:
            return []
        fetch_terms = sorted(set(idfs) | set(must_not_t))
        avgdl = self.avgdl
        n_required = len(must_t)
        if distributed is None:
            if where is not None:
                distributed = True
            elif all(s["bytes"] is not None for s in all_stats.values()):
                est = sum(s["bytes"] for s in all_stats.values())
                distributed = est > self.DISTRIBUTED_FETCH_BYTES
            else:
                distributed = (sum(s["df"] for s in all_stats.values())
                               > self.DISTRIBUTED_POSTINGS_THRESHOLD)

        must_set, should_set = set(must_t), set(should_t)
        mn_set = set(must_not_t)
        mm = int(min_should_match)

        if not distributed:
            allowed = self.allowed_ids(where)
            blocks = self.fetch_blocks(fetch_terms)
            excluded = _excluded_ids(
                [r for t in must_not_t for r in blocks.get(t, [])])
            merged = _merge_deleted(self.tombstones, excluded)
            must_c = [_Cursor(t, idfs[t], blocks[t], avgdl)
                      for t in must_t if t in blocks]
            should_c = [_Cursor(t, idfs[t], blocks[t], avgdl)
                        for t in should_t if t in blocks]
            if must_t:
                return _boolean_topk(must_c, should_c, k, n_required,
                                     deleted=merged, allowed=allowed,
                                     min_should_match=mm)
            if mm > 1:
                return _or_topk(should_c, k, deleted=merged,
                                allowed=allowed, min_match=mm)
            return _wand_topk(should_c, k, deleted=merged, allowed=allowed)

        tomb_bc = self._tomb_bc
        blocks_df = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(fetch_terms))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin")
        )

        def _walk(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")})
            if allow is not None and len(allow) == 0:
                return empty
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            if not by_term:
                return empty
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            excluded = _excluded_ids(
                [r for t in mn_set for r in by_term.get(t, [])])
            merged = _merge_deleted(tomb_bc.value, excluded)
            must_c = [_Cursor(t, idfs[t], by_term[t], avgdl)
                      for t in sorted(must_set) if t in by_term]
            should_c = [_Cursor(t, idfs[t], by_term[t], avgdl)
                        for t in sorted(should_set) if t in by_term]
            if must_set:
                hits = _boolean_topk(must_c, should_c, k, n_required,
                                     deleted=merged, allowed=allow,
                                     min_should_match=mm)
            elif mm > 1:
                hits = _or_topk(should_c, k, deleted=merged,
                                allowed=allow, min_match=mm)
            elif should_c:
                hits = _wand_topk(should_c, k, deleted=merged,
                                  allowed=allow)
            else:
                hits = []
            return pd.DataFrame(
                {"doc_id": [d for d, _ in hits],
                 "score": [s for _, s in hits]},
                columns=["doc_id", "score"],
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "doc_id long, score double"
        if where is None:
            local = blocks_df.groupBy("part").applyInPandas(
                lambda pdf: _walk(pdf, None), schema=out_schema
            ).collect()
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk(bl_pdf, allow)

            local = (
                blocks_df.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_filtered, schema=out_schema)
                .collect()
            )
        merged_rows = sorted(local, key=lambda r: (-r["score"], r["doc_id"]))
        return [(int(r["doc_id"]), float(r["score"]))
                for r in merged_rows[:k]]

    def search_grouped_boolean(
        self, groups: list[tuple[list[str], float]],
        should: list[str] = (), must_not: list[str] = (), *,
        boosts: dict[str, float] | None = None, k: int = 10,
        where: str | None = None, distributed: bool | None = None,
    ) -> list[tuple[int, float]]:
        """BooleanQuery whose MUST side is a list of at-least-one-of term
        GROUPS — Lucene's ``+(a b c)`` shape, the rewrite target of MUST
        wildcard/fuzzy clauses (:meth:`search_lucene` routes them here; a
        plain MUST term arrives as a singleton group). Each group entry is
        ``(terms, boost)``: the group gates matching (≥1 member present),
        every PRESENT member contributes ``boost·idf(t)·tf/(tf+K(dl))``,
        and a group with NO index-present member means the whole query
        matches nothing (Lucene: an empty rewritten MUST clause is
        MatchNoDocs). SHOULD / MUST_NOT / ``boosts`` / ``where`` behave as
        in :meth:`search_boolean`; routing uses the same byte estimate
        over ALL touched terms, and the distributed path runs the grouped
        walk per part bucket with the standard ≤ parts·k driver merge."""
        norm = lambda xs: [t for x in xs for t in tokenize(x)]  # noqa: E731
        groups_t: list[tuple[list[str], float]] = [
            (sorted(set(norm(g))), float(b)) for g, b in groups
        ]
        if any(not g for g, _ in groups_t):
            return []
        must_not_t = sorted(set(norm(must_not)))
        group_terms = sorted({t for g, _ in groups_t for t in g})
        should_t = sorted(set(norm(should)) - set(group_terms))
        stat_terms = sorted(set(group_terms) | set(should_t)
                            | set(must_not_t))
        all_stats = self.term_stats(stat_terms)
        # drop index-absent members; an emptied group → MatchNoDocs
        groups_t = [([t for t in g if t in all_stats], b)
                    for g, b in groups_t]
        if any(not g for g, _ in groups_t):
            return []
        boosts = boosts or {}
        base_idfs = {t: self._idf(s["df"]) for t, s in all_stats.items()
                     if t in set(group_terms) | set(should_t)}
        should_idfs = {t: base_idfs[t] * float(boosts.get(t, 1.0))
                       for t in should_t if t in base_idfs}
        fetch_terms = sorted({t for g, _ in groups_t for t in g}
                             | set(should_idfs) | set(must_not_t))
        avgdl = self.avgdl
        if distributed is None:
            if where is not None:
                distributed = True
            elif all(s["bytes"] is not None for s in all_stats.values()):
                est = sum(s["bytes"] for s in all_stats.values())
                distributed = est > self.DISTRIBUTED_FETCH_BYTES
            else:
                distributed = (sum(s["df"] for s in all_stats.values())
                               > self.DISTRIBUTED_POSTINGS_THRESHOLD)
        self.last_path = "distributed" if distributed else "driver"
        mn_set = set(must_not_t)

        def _mk_cursors(by_term: dict[str, list]):
            gs = [
                [_Cursor(t, base_idfs[t] * b, by_term[t], avgdl)
                 for t in g if t in by_term]
                for g, b in groups_t
            ]
            sc = [_Cursor(t, should_idfs[t], by_term[t], avgdl)
                  for t in sorted(should_idfs) if t in by_term]
            return gs, sc

        if not distributed:
            allowed = self.allowed_ids(where)
            blocks = self.fetch_blocks(fetch_terms)
            excluded = _excluded_ids(
                [r for t in must_not_t for r in blocks.get(t, [])])
            merged = _merge_deleted(self.tombstones, excluded)
            gs, sc = _mk_cursors(blocks)
            return _grouped_topk(gs, sc, k, deleted=merged, allowed=allowed)

        tomb_bc = self._tomb_bc
        blocks_df = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(fetch_terms))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin")
        )

        def _walk(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")})
            if allow is not None and len(allow) == 0:
                return empty
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            if not by_term:
                return empty
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            excluded = _excluded_ids(
                [r for t in mn_set for r in by_term.get(t, [])])
            merged = _merge_deleted(tomb_bc.value, excluded)
            gs, sc = _mk_cursors(by_term)
            hits = _grouped_topk(gs, sc, k, deleted=merged, allowed=allow)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in hits],
                 "score": [s for _, s in hits]},
                columns=["doc_id", "score"],
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "doc_id long, score double"
        if where is None:
            local = blocks_df.groupBy("part").applyInPandas(
                lambda pdf: _walk(pdf, None), schema=out_schema
            ).collect()
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk(bl_pdf, allow)

            local = (
                blocks_df.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_filtered, schema=out_schema)
                .collect()
            )
        merged_rows = sorted(local, key=lambda r: (-r["score"], r["doc_id"]))
        return [(int(r["doc_id"]), float(r["score"]))
                for r in merged_rows[:k]]

    def _search_mixed(
        self, spec, k: int = 10, *, where: str | None = None,
        distributed: bool | None = None,
    ) -> list[tuple[int, float]]:
        """Execute a MIXED clause set — phrases interleaved with boolean
        term clauses inside one scorer tree, the composition Lucene's
        BooleanQuery performs natively (``+"table hash" filter -dup``).
        ``spec`` comes from :func:`_mixed_spec`. Requires a positional
        index (the phrase members decode positions).

        Plan shape: ONE termstats scan (stats + routing + idf), ONE
        term-pruned block fetch WITH positions, then :func:`_mixed_walk` —
        required phrases are singleton groups of a :class:`_PhraseCursor`
        on the grouped leapfrog, optional phrases are riders; MUST_NOT
        postings decode ids-only where the walk runs. Auto-routing as in
        :meth:`search`: filtered queries always distributed, otherwise the
        build-time byte estimate (positions make the true fetch ~1.2× the
        CORE payload — same documented lean as :meth:`search_phrase`).
        The distributed path runs the identical walk per part bucket
        (disjoint doc-id stripes make phrase matching bucket-local) with
        the standard ≤ parts·k driver merge."""
        term_groups, should_terms, must_not, phrases, not_phrases = spec
        self._require_positional()
        phrase_terms = {t for toks, *_ in phrases for t in toks}
        np_terms = {t for toks, _ in not_phrases for t in toks}
        scored = sorted({t for g, _ in term_groups for t in g}
                        | {t for t, _ in should_terms} | phrase_terms)
        if not scored:
            return []
        all_stats = self.term_stats(
            sorted(set(scored) | set(must_not) | np_terms))
        # global MatchNoDocs: a required clause with an unindexed member
        for g, _ in term_groups:
            if not any(t in all_stats for t in g):
                return []
        for toks, required, _, _ in phrases:
            if required and any(t not in all_stats for t in toks):
                return []
        base_idfs = {t: self._idf(s["df"]) for t, s in all_stats.items()
                     if t in set(scored)}
        if not base_idfs:
            return []
        avgdl = self.avgdl
        if distributed is None:
            if where is not None:
                distributed = True
            elif all(s["bytes"] is not None for s in all_stats.values()):
                est = sum(s["bytes"] for s in all_stats.values())
                distributed = est > self.DISTRIBUTED_FETCH_BYTES
            else:
                distributed = (sum(s["df"] for s in all_stats.values())
                               > self.DISTRIBUTED_POSTINGS_THRESHOLD)
        self.last_path = "distributed" if distributed else "driver"
        # prohibited-phrase terms fetch too (position walks build their
        # exclusion sets), pruned to index-present ones
        fetch = sorted(set(base_idfs) | set(must_not)
                       | (np_terms & set(all_stats)))
        mn_set = set(must_not)

        if not distributed:
            allowed = self.allowed_ids(where)
            blocks = self.fetch_blocks(fetch, with_positions=True)
            excluded = _excluded_ids(
                [r for t in must_not for r in blocks.get(t, [])])
            merged = _merge_deleted(self.tombstones, excluded)
            return _mixed_walk(blocks, base_idfs, avgdl, term_groups,
                               should_terms, phrases, k, merged, allowed,
                               not_phrases=not_phrases)

        tomb_bc = self._tomb_bc
        blocks_df = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(fetch))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin",
                    "pos_bin")
        )

        def _walk(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")})
            if allow is not None and len(allow) == 0:
                return empty
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            if not by_term:
                return empty
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            excluded = _excluded_ids(
                [r for t in mn_set for r in by_term.get(t, [])])
            merged = _merge_deleted(tomb_bc.value, excluded)
            hits = _mixed_walk(by_term, base_idfs, avgdl, term_groups,
                               should_terms, phrases, k, merged, allow,
                               not_phrases=not_phrases)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in hits],
                 "score": [s for _, s in hits]},
                columns=["doc_id", "score"],
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "doc_id long, score double"
        if where is None:
            local = blocks_df.groupBy("part").applyInPandas(
                lambda pdf: _walk(pdf, None), schema=out_schema
            ).collect()
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk(bl_pdf, allow)

            local = (
                blocks_df.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_filtered, schema=out_schema)
                .collect()
            )
        merged_rows = sorted(local, key=lambda r: (-r["score"], r["doc_id"]))
        return [(int(r["doc_id"]), float(r["score"]))
                for r in merged_rows[:k]]

    def search_lucene(
        self, q: str, k: int = 10, *, where: str | None = None,
        distributed: bool | None = None, min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """Search with Lucene classic query syntax (the Solr ``q`` string
        the reference's production surface speaks): ``+required``,
        ``-prohibited``, ``"exact phrase"`` (+ ``~slop``), ``term^boost``,
        ``wild*ard`` and ``fuzzy~N`` — parsed by :mod:`.qparse` and routed
        onto the native walks.

        Multi-term clauses (wildcard/fuzzy) expand against the term
        dictionary (:meth:`expand_wildcard` / :meth:`expand_fuzzy`, one
        termstats scan each, deterministic top-df caps): SHOULD expansions
        join the should list, MUST_NOT expansions the prohibited list, and
        MUST expansions become at-least-one-of groups on the grouped walk
        (:meth:`search_grouped_boolean`) — Lucene's SCORING_BOOLEAN
        rewrite, every expanded term scoring with its own idf under the
        clause's boost.

        Routing: a lone unboosted phrase clause runs the dedicated
        positional phrase walk (slop honored, byte-based auto-routing);
        phrase clauses MIXED with any other clause (or boosted, or
        several) run the one-scorer-tree mixed walk (:meth:`_search_mixed`
        — required phrases gate via :class:`_PhraseCursor` groups,
        optional ones ride). Pure term-clause queries run
        :meth:`search_boolean` (or the grouped walk when MUST expansions
        exist) and keep their WAND/block-max pruning."""
        from .qparse import parse_query

        p = parse_query(q)
        if min_should_match and (p.phrases or p.not_phrases
                                 or p.wildcards or p.fuzzies):
            raise ValueError(
                "min_should_match is supported for plain term clauses "
                "only — Lucene counts an expanded/phrase clause as ONE "
                "optional clause, which our flattened rewrite cannot "
                "honor; compose via search_boolean if needed")
        if (len(p.phrases) == 1 and p.phrases[0][2] == 1.0
                and not (p.must or p.should or p.must_not or p.wildcards
                         or p.fuzzies or p.not_phrases)):
            toks, _required, _boost, slop = p.phrases[0]
            return self.search_phrase(" ".join(toks), k, where=where,
                                      slop=slop, distributed=distributed)
        should = [t for t, _ in p.should]
        must_not = list(p.must_not)
        boosts = dict(p.boosts)
        must_groups: list[tuple[list[str], float]] = []
        expansions = (
            [(self.expand_wildcard(pat), occ, b)
             for pat, occ, b in p.wildcards]
            + [(self.expand_fuzzy(t, e), occ, b)
               for t, e, occ, b in p.fuzzies]
        )
        if p.phrases or p.not_phrases:
            spec = _mixed_spec(p, expansions)
            if spec is None:
                return []  # empty rewritten MUST clause: MatchNoDocs
            return self._search_mixed(spec, k, where=where,
                                      distributed=distributed)
        for exp, occ, b in expansions:
            if occ == "-":
                must_not.extend(exp)
            elif occ == "+":
                if not exp:
                    return []  # empty rewritten MUST clause: MatchNoDocs
                must_groups.append((exp, b))
            else:
                should.extend(exp)
                if b != 1.0:
                    for t in exp:
                        boosts.setdefault(t, b)
        if must_groups:
            # plain MUST terms ride as singleton groups, dedup first-boost-
            # wins, SORTED — the same group order the SQL-surface twin
            # builds, so float summation order (and thus scores to the ulp)
            # agree across surfaces
            must_dedup: dict[str, float] = {}
            for t, b in p.must:
                must_dedup.setdefault(t, b)
            must_groups = ([([t], b) for t, b in sorted(must_dedup.items())]
                           + must_groups)
            return self.search_grouped_boolean(
                must_groups, should, must_not, boosts=boosts, k=k,
                where=where, distributed=distributed)
        return self.search_boolean(
            [t for t, _ in p.must], should, must_not,
            boosts=boosts, k=k, where=where, distributed=distributed,
            min_should_match=min_should_match)

    def matched_docs(
        self, query: str, *, mode: str = "or", where: str | None = None,
        _stats: dict | None = None,
    ) -> DataFrame:
        """The query's FULL match set as a declarative DataFrame of
        doc_ids (no scoring): term-pruned postings decode → per-doc
        distinct-term count (AND = all terms), fq semi-join, tombstone
        anti-join. The substrate for the non-scoring serving surfaces
        (sort-by-field, grouping) — Solr computes these over the match
        set, not the top-k page."""
        if mode not in ("or", "and"):
            raise ValueError(f"unknown mode: {mode!r}")
        terms = sorted(set(tokenize(query)))
        stats = self.term_stats(terms) if _stats is None else \
            {t: _stats[t] for t in terms if t in _stats}
        empty = self.spark.createDataFrame([], "doc_id long")
        if not stats or (mode == "and" and len(stats) < len(terms)):
            return empty
        matched = (
            self.postings_view(sorted(stats))
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nterms"))
        )
        if mode == "and":
            matched = matched.filter(F.col("_nterms") == len(terms))
        matched = matched.select("doc_id")
        if where is not None:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("doc_id")
            )
            matched = matched.join(visible, "doc_id", "left_semi")
        if len(self.tombstones):
            tomb = self._read(
                self._tomb_path).select("doc_id").distinct()
            matched = matched.join(tomb, "doc_id", "left_anti")
        return matched

    def _synonym_groups(self, query: str,
                        synonyms: dict[str, list[str]]):
        """Query tokens → synonym groups: [(name, members)] with members
        deduped, plus the sorted union of all member terms."""
        groups = []
        for t in sorted(set(tokenize(query))):
            members = sorted({t, *(synonyms.get(t) or [])})
            groups.append(("|".join(members), members))
        all_terms = sorted({m for _, ms in groups for m in ms})
        return groups, all_terms

    def search_synonyms(
        self, query: str, synonyms: dict[str, list[str]], k: int = 10, *,
        where: str | None = None,
    ) -> list[tuple[int, float]]:
        """Query-time synonym expansion with Lucene SynonymQuery scoring:
        each query term and its synonyms form ONE scorer — tf at a doc is
        the sum of member tfs, idf comes from the max member df — so a
        doc never scores a concept twice just for using both spellings
        (the Solr SynonymGraphFilter query-time shape). Exact top-k under
        (score desc, doc_id asc) via the disjunctive merge walk; groups
        whose every member is unindexed simply contribute nothing.

        Driver walk (block fetch is one term-pruned scan over the union
        of member terms); see :meth:`search_synonyms_distributed` for the
        per-part executor shape."""
        groups, all_terms = self._synonym_groups(query, synonyms)
        stats = self.term_stats(all_terms)
        if not stats:
            return []
        allowed = self.allowed_ids(where)
        blocks = self.fetch_blocks([t for t in all_terms if t in stats])
        cursors = []
        for name, members in groups:
            live = [m for m in members if m in stats and m in blocks]
            if not live:
                continue
            idf = self._idf(max(stats[m]["df"] for m in live))
            cursors.append(_SynCursor(
                [_Cursor(m, 0.0, blocks[m], self.avgdl) for m in live],
                idf, self.avgdl, name))
        if not cursors:
            return []
        return _or_topk(cursors, k, deleted=self.tombstones, allowed=allowed)

    def search_synonyms_distributed(
        self, query: str, synonyms: dict[str, list[str]], k: int = 10, *,
        where: str | None = None,
    ) -> list[tuple[int, float]]:
        """The executor-side twin of :meth:`search_synonyms`: one
        applyInPandas group per index part bucket (disjoint doc ids, so
        per-part exact top-k merge is the global answer), idfs computed
        once from a single termstats scan and shipped in the closure;
        the fq predicate cogroups with the block scan like every other
        distributed walk. Rank- and score-identical to the driver walk."""
        groups, all_terms = self._synonym_groups(query, synonyms)
        stats = self.term_stats(all_terms)
        if not stats:
            return []
        group_spec = []  # (name, live_members, idf)
        for name, members in groups:
            live = [m for m in members if m in stats]
            if live:
                group_spec.append(
                    (name, live,
                     self._idf(max(stats[m]["df"] for m in live))))
        if not group_spec:
            return []
        avgdl = self.avgdl
        tomb_bc = self._tomb_bc
        live_terms = sorted({m for _, ms, _ in group_spec for m in ms})
        blocks = (
            self._read(self.paths.blocks)
            .filter(F.col("term").isin(live_terms))
            .select("part", "term", "first_doc_id", "last_doc_id", "n",
                    "max_tf", "dl_min", "ids_bin", "tfs_bin", "dls_bin")
        )

        def _walk(pdf, allow):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")})
            if allow is not None and len(allow) == 0:
                return empty
            by_term: dict[str, list] = {}
            for rec in pdf.to_dict("records"):
                by_term.setdefault(rec["term"], []).append(rec)
            for t in by_term:
                by_term[t].sort(key=lambda r: r["first_doc_id"])
            cursors = []
            for name, members, idf in group_spec:
                live = [m for m in members if m in by_term]
                if not live:
                    continue
                cursors.append(_SynCursor(
                    [_Cursor(m, 0.0, by_term[m], avgdl) for m in live],
                    idf, avgdl, name))
            if not cursors:
                return empty
            hits = _or_topk(cursors, k, deleted=tomb_bc.value,
                            allowed=allow)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in hits],
                 "score": [sc for _, sc in hits]},
                columns=["doc_id", "score"],
            ).astype({"doc_id": "int64", "score": "float64"})

        out_schema = "doc_id long, score double"
        if where is None:
            local = blocks.groupBy("part").applyInPandas(
                lambda pdf: _walk(pdf, None), schema=out_schema).collect()
        else:
            visible = (
                self._read(self.paths.docstore)
                .filter(where).select("part", "doc_id")
            )

            def _walk_filtered(bl_pdf, vis_pdf):
                allow = np.unique(vis_pdf["doc_id"].values.astype(np.int64))
                return _walk(bl_pdf, allow)

            local = (
                blocks.groupBy("part")
                .cogroup(visible.groupBy("part"))
                .applyInPandas(_walk_filtered, schema=out_schema)
                .collect()
            )
        merged = sorted(local, key=lambda r: (-r["score"], r["doc_id"]))[:k]
        return [(int(r["doc_id"]), float(r["score"])) for r in merged]

    def explain_query(self, query: str, *, mode: str = "or",
                      where: str | None = None) -> dict:
        """Solr ``debugQuery`` analog, planner-side: what the engine KNOWS
        about a query before running it — per-term df/idf/packed-block
        bytes from build-time metadata, the estimated fetch volume, the
        routing decision search() would take and why, terms absent from
        the index, and whether an and-mode query is unsatisfiable. ONE
        termstats scan, no blocks touched — safe to call on every query
        of a production workload for routing audits."""
        if mode not in ("or", "and"):
            raise ValueError(f"unknown mode: {mode!r}")
        terms = sorted(set(tokenize(query)))
        stats = self.term_stats(terms)
        per_term = {
            t: {
                "df": stats[t]["df"],
                "idf": self._idf(stats[t]["df"]),
                "bytes": stats[t]["bytes"],
            } if t in stats else None
            for t in terms
        }
        missing = [t for t in terms if t not in stats]
        est_bytes = (sum(s["bytes"] for s in stats.values())
                     if stats and all(s["bytes"] is not None
                                      for s in stats.values()) else None)
        if where is not None:
            route, reason = "distributed", "fq filters always route " \
                "distributed (visibility set stays executor-side)"
        elif not stats:
            # search() still takes the driver path (trivially empty) —
            # report what it actually does so route == last_path always
            route, reason = "driver", ("no query term is indexed "
                                       "(search() returns empty from the "
                                       "driver path)")
        elif est_bytes is not None:
            big = est_bytes > self.DISTRIBUTED_FETCH_BYTES
            route = "distributed" if big else "driver"
            reason = (f"estimated fetch {est_bytes} bytes "
                      f"{'>' if big else '<='} "
                      f"{self.DISTRIBUTED_FETCH_BYTES} threshold")
        else:
            tot = sum(s["df"] for s in stats.values())
            big = tot > self.DISTRIBUTED_POSTINGS_THRESHOLD
            route = "distributed" if big else "driver"
            reason = (f"no byte metadata (pre-r4 index): Σdf {tot} "
                      f"{'>' if big else '<='} "
                      f"{self.DISTRIBUTED_POSTINGS_THRESHOLD}")
        return {
            "terms": per_term,
            "missing_terms": missing,
            "est_fetch_bytes": est_bytes,
            "route": route,
            "route_reason": reason,
            "and_unsatisfiable": mode == "and" and bool(missing),
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
        }

    def facet_queries(
        self, queries: dict[str, str], *, mode: str = "or",
        where: str | None = None,
    ) -> DataFrame:
        """Solr ``facet.query``: a document count for EACH named subquery
        over the index — the arbitrary-bucket companion of facet.field
        (Collex sidebars mix field facets with canned query facets).

        One COUNT job for the whole set: each subquery's declarative
        match set (:meth:`matched_docs` — term-pruned decode, fq
        semi-join, tombstone anti-join) is tagged and unioned, a single
        partial-aggregated count per tag comes back, and a generated name
        spine left-join restores Solr's explicit zero counts for
        subqueries matching nothing; every subquery's term statistics
        resolve in one batched termstats scan up front (not one metadata
        job per subquery). Returns (facet_query, n)."""
        if not queries:
            raise ValueError("facet_queries needs at least one subquery")
        all_terms = sorted({t for q in queries.values()
                            for t in set(tokenize(q))})
        stats = self.term_stats(all_terms)
        tagged = [
            self.matched_docs(q, mode=mode, where=where, _stats=stats)
            .select(F.lit(name).alias("facet_query"), "doc_id")
            for name, q in sorted(queries.items())
        ]
        union = tagged[0]
        for t in tagged[1:]:
            union = union.unionByName(t)
        spine = self.spark.createDataFrame(
            [(n,) for n in sorted(queries)], "facet_query string")
        counts = union.groupBy("facet_query").agg(
            F.count("*").cast("long").alias("n"))
        return (
            spine.join(counts, "facet_query", "left")
            .select("facet_query",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        )

    def facet_range(
        self, query: str, field: str, start: float, end: float, gap: float,
        *, mode: str = "or", where: str | None = None,
    ) -> DataFrame:
        """Solr ``facet.range``: bucketed counts of a stored numeric field
        over the query's FULL match set — buckets are ``[start+i·gap,
        start+(i+1)·gap)`` and EVERY bucket in ``[start, end)`` is
        returned, zeros included (Solr's contract; the UI draws the empty
        bars). Declarative: match set ⋈ pruned docstore → floor-bucket →
        partial-agg count → left join onto a generated bucket spine.
        Returns (bucket_start, n) ordered by bucket."""
        if gap <= 0 or end <= start:
            raise ValueError("facet_range needs gap > 0 and end > start")
        n_buckets = int(math.ceil((end - start) / gap))
        spine = self.spark.range(n_buckets).select(
            (F.lit(float(start)) + F.col("id") * F.lit(float(gap))
             ).alias("bucket_start"))
        meta = self._read(self.paths.docstore).select(
            "doc_id", field)
        bucket = (F.lit(float(start)) + F.floor(
            (F.col(field) - F.lit(float(start))) / F.lit(float(gap))
        ) * F.lit(float(gap))).alias("bucket_start")
        counts = (
            self.matched_docs(query, mode=mode, where=where)
            .join(meta, "doc_id")
            .filter((F.col(field) >= start) & (F.col(field) < end))
            .select(bucket)
            .groupBy("bucket_start")
            .agg(F.count("*").alias("n"))
        )
        return (
            spine.join(counts, "bucket_start", "left")
            .select("bucket_start",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"))
            .orderBy("bucket_start")
        )

    def field_stats(
        self, query: str, field: str, *, mode: str = "or",
        where: str | None = None,
    ) -> DataFrame:
        """Solr stats component (``stats.field=<f>``): count/min/max/sum/
        mean of a stored numeric field over the query's full match set —
        one partial-aggregated pass, one row out."""
        meta = self._read(self.paths.docstore).select(
            "doc_id", field)
        return (
            self.matched_docs(query, mode=mode, where=where)
            .join(meta, "doc_id")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.min(field).alias("min"),
                F.max(field).alias("max"),
                F.sum(field).alias("sum"),
                F.round(F.avg(field), 6).alias("mean"),
            )
        )

    def terms(
        self, prefix: str | None = None, *, limit: int = 20,
    ) -> DataFrame:
        """Solr terms component (``terms.fl``/``terms.prefix`` — the
        autocomplete/dictionary-browse surface): enumerate the term
        dictionary with document frequencies, optionally prefix-filtered,
        ordered by (df desc, term asc), top ``limit``.

        One termstats scan — the prefix is a ``startswith`` Column filter
        that pushes down to the parquet reader (StringStartsWith), and the
        top-N is a TakeOrdered, so only ``limit`` rows reach the driver
        side of the plan no matter the dictionary size. Like Lucene
        ``docFreq``, counts are index-level and do not subtract tombstoned
        docs until a compact (COVERAGE.md notes the parity)."""
        ts = self._read(self.paths.termstats).select(
            "term", F.col("df").cast("long").alias("df"))
        if prefix:
            ts = ts.filter(F.col("term").startswith(prefix))
        return ts.orderBy(F.desc("df"), F.asc("term")).limit(limit)

    def facet_pivot(
        self, query: str, fields: list[str], *, mode: str = "or",
        where: str | None = None, top: int = 5,
    ) -> DataFrame:
        """Solr pivot facets (``facet.pivot=f1,f2``): nested value counts
        over the query's FULL match set — for each value of ``fields[0]``,
        the ``top`` values of ``fields[1]`` by (n desc, value asc).

        Same scale shape as :meth:`facet_counts`: the match set ∩ metadata
        step is a COGROUPED per-part kernel (ids-only block decode, numpy
        membership mask, per-part PARTIAL pair counts), so the final
        groupBy sees ≤ parts × |f1×f2 observed| rows — nothing proportional
        to corpus size past the scans. Returns (parent_value, facet_value,
        n) with ``fields[0]`` values cast to string like facet_counts."""
        if mode not in ("or", "and"):
            raise ValueError(f"unknown mode: {mode!r}")
        if len(fields) != 2:
            raise ValueError("facet_pivot takes exactly two fields")
        self._check_facet_fields(fields)
        f1, f2 = fields
        tomb_bc = self._tomb_bc
        out_schema = "parent_value string, facet_value string, cnt long"

        def _pair_counts(doc_pdf, matched: np.ndarray | None):
            import pandas as pd

            sub = doc_pdf
            deleted = tomb_bc.value
            if deleted is not None and len(deleted):
                sub = sub[~sub["doc_id"].isin(deleted)]
            if matched is not None:
                sub = sub[np.isin(sub["doc_id"].values.astype(np.int64),
                                  matched)]
            if not len(sub):
                return pd.DataFrame({
                    "parent_value": pd.Series(dtype="object"),
                    "facet_value": pd.Series(dtype="object"),
                    "cnt": pd.Series(dtype="int64")})
            g = (sub.groupby([f1, f2], dropna=False).size()
                 .reset_index(name="cnt"))
            return pd.DataFrame({
                "parent_value": g[f1].astype("object"),
                "facet_value": g[f2].astype("object"),
                "cnt": g["cnt"].astype("int64")})

        partial = self._matchset_partials(query, mode, where, fields,
                                          _pair_counts, out_schema)
        if partial is None:
            return self.spark.createDataFrame([], out_schema).select(
                "parent_value", "facet_value", F.col("cnt").alias("n"))
        from pyspark.sql import Window

        w = Window.partitionBy("parent_value").orderBy(
            F.desc("n"), F.asc_nulls_last("facet_value"))
        return (
            partial.groupBy("parent_value", "facet_value")
            .agg(F.sum("cnt").alias("n"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= top)
            .drop("_r")
        )

    def search_reranked(
        self, query: str, k: int = 10, *, rerank_k: int = 50,
        boost_field: str, boost_weight: float = 1.0, mode: str = "or",
        where: str | None = None,
    ) -> list[tuple[int, float]]:
        """Solr rerank / additive function-query boost (``rq={!rerank
        reRankDocs=N}`` with a ``bf=field`` boost, the
        recency/popularity-boost production shape): fetch the BM25 top
        ``rerank_k`` candidates, rescore each as ``bm25 + boost_weight ×
        boost_field`` (a stored numeric docstore field, NULL → 0), and
        return the top ``k`` under (score desc, doc_id asc).

        Scale shape: candidates come from the distributed WAND walk
        (≤ parts·rerank_k rows to the driver); the rescore joins the
        BROADCAST candidate list against the pruned docstore scan
        (doc_id + one numeric column), so the big side never shuffles.
        Exact within the candidate window, like Lucene's ReRankQuery —
        a doc outside the BM25 top-``rerank_k`` cannot enter the page."""
        cands = self.search_wand_distributed(
            query, rerank_k, mode=mode, where=where)
        if not cands:
            return []
        cdf = self.spark.createDataFrame(
            [(int(d), float(s)) for d, s in cands],
            "doc_id long, score double")
        meta = self._read(self.paths.docstore).select(
            "doc_id", F.col(boost_field).cast("double").alias("_bf"))
        rows = (
            meta.join(F.broadcast(cdf), "doc_id")
            .select(
                "doc_id",
                (F.col("score") + F.lit(float(boost_weight)) *
                 F.coalesce("_bf", F.lit(0.0))).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        return [(int(r["doc_id"]), float(r["score"])) for r in rows]

    def search_sorted(
        self, query: str, sort_by: str, *, ascending: bool = True,
        k: int = 10, mode: str = "or", where: str | None = None,
    ) -> DataFrame:
        """Solr ``sort=<field> asc|desc``: the top-k of the query's match
        set ordered by a STORED field (docstore metadata / doc values)
        instead of relevance — no scores are computed, exactly like Solr
        skips scoring for non-score sorts. doc_id breaks ties so the page
        is deterministic. Declarative plan: match set ⋈ pruned docstore
        (doc_id, field) → global top-k (TakeOrdered — only k rows move).
        Returns (doc_id, <sort_by>)."""
        meta = self._read(self.paths.docstore).select(
            "doc_id", sort_by)
        order = [F.asc(sort_by) if ascending else F.desc(sort_by),
                 F.asc("doc_id")]
        return (
            self.matched_docs(query, mode=mode, where=where)
            .join(meta, "doc_id")
            .orderBy(*order)
            .limit(k)
        )

    def search_grouped(
        self, query: str, group_by: str, *, k_groups: int = 5,
        k_per_group: int = 2, mode: str = "or", where: str | None = None,
    ) -> DataFrame:
        """Solr result grouping / field collapse (``group=true&group.field=
        <f>``): the top ``k_per_group`` docs by BM25 within each value of a
        stored field, for the ``k_groups`` best groups — groups ranked by
        their best doc's score (Solr's default group ordering), ties by
        group value. Declarative composition: the exhaustive scorer's full
        match-set scores ⋈ pruned docstore metadata → two window ranks —
        Catalyst plans it, partial aggregation keeps the group ranking
        shuffle at |groups| rows. Returns (group value, doc_id, score,
        doc_rank)."""
        from pyspark.sql import Window

        scored = self.score_exhaustive(query, k=None, mode=mode,
                                       where=where)
        meta = self._read(self.paths.docstore).select(
            "doc_id", group_by)
        joined = scored.join(meta, "doc_id")
        w_doc = Window.partitionBy(group_by).orderBy(
            F.desc("score"), F.asc("doc_id"))
        ranked = joined.withColumn("doc_rank", F.row_number().over(w_doc)) \
            .filter(F.col("doc_rank") <= k_per_group)
        top_groups = (
            joined.groupBy(group_by)
            .agg(F.max("score").alias("_gs"))
            .orderBy(F.desc("_gs"), F.asc(group_by))
            .limit(k_groups)
            .select(group_by)
        )
        return ranked.join(F.broadcast(top_groups), group_by).select(
            group_by, "doc_id", "score", "doc_rank")

    # Auto-select guards for search(). Primary: estimated FETCH BYTES — the
    # actual cost of the driver walk is pulling the query terms' packed
    # blocks to one machine, and byte size is what build-time block metadata
    # measures exactly (termstats.bytes = Σ bin_bytes). Past a few MB the
    # distributed walk's extra job overhead is already amortized and the
    # driver stops being a bandwidth funnel.
    DISTRIBUTED_FETCH_BYTES = 4 << 20
    # Fallback for pre-r4 indexes whose termstats lack the bytes column:
    # ~500k postings ≈ a few MB of packed blocks.
    DISTRIBUTED_POSTINGS_THRESHOLD = 500_000

    def search(
        self, query: str, k: int = 10, *, distributed: bool | None = None,
        mode: str = "or", where: str | None = None,
        after: tuple[int, float] | None = None,
    ) -> DataFrame:
        """Default query path. ``distributed=None`` auto-selects: the
        executor-side WAND walk (search_wand_distributed — the cluster-scale
        shape, nothing bigger than parts·k rows reaches the driver) unless
        the query's estimated block-fetch volume (from build-time metadata,
        see :meth:`term_stats`) is small enough that the driver walk is a
        cheap fast path. Filtered queries (``where``) ALWAYS route
        distributed: the fq predicate evaluates executor-side there, so the
        visible-id set never funnels through the driver regardless of the
        predicate's selectivity. Both paths are rank- and score-identical
        (asserted in tests/test_index.py). The chosen route is recorded in
        ``self.last_path`` ("driver" | "distributed").

        ONE termstats scan serves routing AND idf computation — the stats
        fetched here are passed down to the chosen walk.

        ``after`` = the previous page's last (doc_id, score) hit (Solr
        cursorMark / Lucene searchAfter): returns the next ``k`` results
        strictly after it in (score desc, doc_id asc) order — stateless
        deep paging with no ``start`` offset, so page 10^6 costs the same
        one walk as page 1 (Solr's start=N deep paging materializes N+k
        candidates per shard; the cursor form is why CursorMark exists)."""
        terms = sorted(set(tokenize(query)))
        stats = self.term_stats(terms)
        idfs = {t: self._idf(s["df"]) for t, s in stats.items()}
        if distributed is None:
            if where is not None:
                distributed = True
            elif all(s["bytes"] is not None for s in stats.values()):
                est = sum(s["bytes"] for s in stats.values())
                distributed = est > self.DISTRIBUTED_FETCH_BYTES
            else:
                distributed = (sum(s["df"] for s in stats.values())
                               > self.DISTRIBUTED_POSTINGS_THRESHOLD)
        self.last_path = "distributed" if distributed else "driver"
        hits = (
            self.search_wand_distributed(query, k, mode=mode, where=where,
                                         _idfs=idfs, after=after)
            if distributed
            else self.search_wand(query, k, mode=mode, where=where,
                                  _idfs=idfs, after=after)
        )
        return self.spark.createDataFrame(
            [(int(d), float(s), r + 1) for r, (d, s) in enumerate(hits)],
            "doc_id long, score double, rank int",
        )


def _decode_blocks_stream(batches):
    """mapInPandas kernel: packed block rows → (term, doc_id, tf, dl)."""
    import pandas as pd

    for pdf in batches:
        terms, ids, tfs, dls = [], [], [], []
        for term, ib, tb, db in zip(pdf["term"], pdf["ids_bin"],
                                    pdf["tfs_bin"], pdf["dls_bin"]):
            i, t, d = unpack_block(bytes(ib), bytes(tb), bytes(db))
            terms.extend([term] * len(i))
            ids.append(i)
            tfs.append(t)
            dls.append(d)
        if not ids:
            continue
        yield pd.DataFrame({
            "term": terms,
            "doc_id": np.concatenate(ids),
            "tf": np.concatenate(tfs),
            "dl": np.concatenate(dls),
        })


def _decode_blocks_pos_stream(batches):
    """mapInPandas kernel: packed POSITIONAL block rows →
    (term, doc_id, tf, dl, positions)."""
    import pandas as pd

    for pdf in batches:
        terms, ids, tfs, dls, poss = [], [], [], [], []
        for term, ib, tb, db, pb in zip(pdf["term"], pdf["ids_bin"],
                                        pdf["tfs_bin"], pdf["dls_bin"],
                                        pdf["pos_bin"]):
            if pb is None:
                raise ValueError(
                    "not a positional index: block lacks pos_bin")
            i, t, d = unpack_block(bytes(ib), bytes(tb), bytes(db))
            flat, offs = unpack_positions(bytes(pb), t)
            terms.extend([term] * len(i))
            ids.append(i)
            tfs.append(t)
            dls.append(d)
            poss.extend(
                flat[offs[j]:offs[j + 1]].astype(np.int32).tolist()
                for j in range(len(i))
            )
        if not ids:
            continue
        yield pd.DataFrame({
            "term": terms,
            "doc_id": np.concatenate(ids),
            "tf": np.concatenate(tfs),
            "dl": np.concatenate(dls),
            "positions": poss,
        })


def _decode_blocks_compact(positional: bool):
    """mapInPandas kernel factory for maintenance compaction
    (maintain.compact_index): packed block rows → full posting rows
    (part, term, doc_id, tf, dl[, positions]) so survivors can be
    re-packed after dropping tombstoned docs. Unlike the query-path
    kernels this keeps ``part`` (the re-pack is part-aligned) and,
    when ``positional``, carries every posting's position list through
    so compaction preserves phrase capability."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            outs = []
            for rec in pdf.to_dict("records"):
                ids, tfs, dls = unpack_block(
                    bytes(rec["ids_bin"]), bytes(rec["tfs_bin"]),
                    bytes(rec["dls_bin"]))
                out = pd.DataFrame({
                    "part": np.full(len(ids), rec["part"], dtype=np.int32),
                    "term": rec["term"],
                    "doc_id": ids,
                    "tf": tfs,
                    "dl": dls,
                })
                if positional:
                    pb = rec["pos_bin"]
                    if pb is None:
                        raise ValueError(
                            "positional compaction hit a block without "
                            "pos_bin")
                    flat, offs = unpack_positions(bytes(pb), tfs)
                    out["positions"] = [
                        flat[offs[j]:offs[j + 1]].tolist()
                        for j in range(len(ids))
                    ]
                outs.append(out)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return kernel


def _norm(dl: float, avgdl: float) -> float:
    return K1 * (1.0 - B + B * dl / avgdl)


@dataclass
class _Cursor:
    """Posting cursor over one term's sorted block list with lazy decode."""

    term: str
    idf: float
    blocks: list
    avgdl: float
    bi: int = 0
    pos: int = 0
    ids: np.ndarray | None = None
    tfs: np.ndarray | None = None
    dls: np.ndarray | None = None
    exhausted: bool = field(default=False)
    # positional payload (phrase path) — decoded lazily per block, cached
    # by block index so repeated occurrences in one block decode once
    _pos_bi: int = field(default=-1)
    _pos_flat: np.ndarray | None = field(default=None)
    _pos_offs: np.ndarray | None = field(default=None)

    def __post_init__(self):
        self.global_ub = max(
            self._bound(b["max_tf"], b["dl_min"]) for b in self.blocks
        )
        self._load_block()

    def _bound(self, max_tf: int, dl_min: int) -> float:
        return self.idf * max_tf / (max_tf + _norm(dl_min, self.avgdl))

    def _load_block(self) -> None:
        if self.bi >= len(self.blocks):
            self.exhausted = True
            self.ids = None
            return
        b = self.blocks[self.bi]
        self.ids, self.tfs, self.dls = unpack_block(
            bytes(b["ids_bin"]), bytes(b["tfs_bin"]), bytes(b["dls_bin"])
        )
        self.pos = 0

    @property
    def cur_doc(self) -> int:
        if self.exhausted:
            return 1 << 62
        return int(self.ids[self.pos])

    def block_ub(self) -> float:
        if self.exhausted:
            return 0.0
        b = self.blocks[self.bi]
        return self._bound(b["max_tf"], b["dl_min"])

    def block_last(self) -> int:
        if self.exhausted:
            return 1 << 62
        return self.blocks[self.bi]["last_doc_id"]

    def contribution(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * tf / (tf + _norm(dl, self.avgdl))

    def cur_positions(self) -> np.ndarray:
        """Sorted token positions of the CURRENT posting (phrase path;
        requires blocks fetched with ``with_positions=True``). Decodes the
        whole block's ``pos_bin`` once and slices per posting — segment
        boundaries come from the already-decoded tfs (codec layout)."""
        if self._pos_bi != self.bi:
            pb = self.blocks[self.bi]["pos_bin"]
            if pb is None:
                raise ValueError(
                    "not a positional index: rebuild with "
                    "build_index(positions=True) for phrase queries")
            self._pos_flat, self._pos_offs = unpack_positions(bytes(pb), self.tfs)
            self._pos_bi = self.bi
        return self._pos_flat[self._pos_offs[self.pos]:self._pos_offs[self.pos + 1]]

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.ids):
            self.bi += 1
            self._load_block()

    def next_geq(self, target: int) -> None:
        """Skip blocks whose last_doc_id < target (no decode), then binary
        search within the landing block."""
        if self.exhausted:
            return
        if self.blocks[self.bi]["last_doc_id"] < target:
            lo, hi = self.bi + 1, len(self.blocks)
            while lo < hi:
                mid = (lo + hi) // 2
                if self.blocks[mid]["last_doc_id"] < target:
                    lo = mid + 1
                else:
                    hi = mid
            self.bi = lo
            self._load_block()
            if self.exhausted:
                return
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):
            self.bi += 1
            self._load_block()


class _PhraseCursor:
    """Cursor adapter that lets a phrase clause ride the boolean walks as
    if it were a single term — the scorer-tree composition Lucene performs
    when a PhraseQuery sits inside a BooleanQuery. ``cur_doc`` only ever
    lands on docs where the phrase MATCHES (pf > 0 under the slop
    contract): internally a conjunctive leapfrog over the member terms'
    cursors (the same loop as :func:`_phrase_topk`) with position
    verification at aligned docs, so docs failing the AND prefilter or the
    position check are invisible to the outer walk. ``contribution`` =
    boost · (Σ idf with multiplicity) · pf/(pf + K(dl)) — identical to
    :meth:`IndexReader.search_phrase` scoring, so a lone required phrase
    through this adapter equals the dedicated phrase walk (asserted in
    tests). Exposes the subset of the `_Cursor` interface the non-pruning
    walks use (cur_doc / exhausted / next_geq / advance / contribution /
    term); it provides NO block-max bounds, which is why mixed queries run
    the grouped or plain-OR walk rather than WAND."""

    def __init__(self, terms: list[str], idfs: dict[str, float],
                 by_term: dict[str, list], avgdl: float,
                 slop: int = 0, boost: float = 1.0):
        self.term = '"' + " ".join(terms) + '"'  # walk sort key
        self.terms = list(terms)
        self.avgdl = avgdl
        self.slop = slop
        self.idf_sum = boost * sum(idfs[t] for t in terms)  # w/ multiplicity
        uniq = sorted(set(terms))
        self.cursors = {t: _Cursor(t, idfs[t], by_term[t], avgdl)
                        for t in uniq}
        self._cs = list(self.cursors.values())
        self.exhausted = False
        self._doc = 0
        self._pf = 0
        self._dl = 0.0
        self._align(0)

    @property
    def cur_doc(self) -> int:
        return (1 << 62) if self.exhausted else self._doc

    def _align(self, target: int) -> None:
        cs = self._cs
        while True:
            if any(c.exhausted for c in cs):
                self.exhausted = True
                return
            t = max(target, max(c.cur_doc for c in cs))
            for c in cs:
                if c.cur_doc < t:
                    c.next_geq(t)
            if any(c.exhausted for c in cs):
                self.exhausted = True
                return
            if all(c.cur_doc == t for c in cs):
                pf = _phrase_freq(self.terms, self.cursors, self.slop)
                if pf:
                    c0 = cs[0]
                    self._doc, self._pf = t, pf
                    self._dl = float(c0.dls[c0.pos])
                    return
                for c in cs:
                    c.advance()

    def next_geq(self, target: int) -> None:
        if not self.exhausted and self._doc < target:
            self._align(target)

    def advance(self) -> None:
        if self.exhausted:
            return
        for c in self._cs:  # all members sit aligned at the match doc
            c.advance()
        self._align(0)

    def contribution(self) -> float:
        return (self.idf_sum * self._pf
                / (self._pf + _norm(self._dl, self.avgdl)))


class _SynCursor:
    """Lucene SynonymQuery scorer over a group of term cursors: the group
    behaves as ONE pseudo-term — tf at a doc is the SUM of member tfs, the
    idf comes from max member df (SynonymQuery's docFreq blend), so a doc
    matching any member scores once, not per member. Exposes the exact
    merge interface (_or_topk / the grouped walks): cur_doc / exhausted /
    advance / contribution / term."""

    def __init__(self, members: list[_Cursor], idf: float, avgdl: float,
                 name: str):
        self.members = members
        self.idf = idf
        self.avgdl = avgdl
        self.term = name  # deterministic summation order key

    @property
    def exhausted(self) -> bool:
        return all(m.exhausted for m in self.members)

    @property
    def cur_doc(self) -> int:
        return min(m.cur_doc for m in self.members)

    def contribution(self) -> float:
        doc = self.cur_doc
        tf = 0.0
        dl = None
        for m in self.members:
            if not m.exhausted and m.cur_doc == doc:
                tf += float(m.tfs[m.pos])
                dl = float(m.dls[m.pos])
        return self.idf * tf / (tf + _norm(dl, self.avgdl))

    def advance(self) -> None:
        doc = self.cur_doc
        for m in self.members:
            if not m.exhausted and m.cur_doc == doc:
                m.advance()


def _in_sorted(arr: np.ndarray | None, doc: int) -> bool:
    if arr is None or not len(arr):
        return False
    i = int(np.searchsorted(arr, doc))
    return i < len(arr) and int(arr[i]) == doc


# ---------------------------------------------------------------------------
# Vectorized exact scorer (r6): the columnar twin of the cursor walks.
#
# The doc-at-a-time Python walks below pay interpreter cost per POSTING
# (~µs each); for the posting volumes a part bucket holds, one numpy pass
# over the decoded arrays is 50-100× cheaper even though it skips nothing —
# WAND's skipping would have to prune >99% of postings to win at that cost
# ratio, which hot/mixed query mixes never reach. Every walk below therefore
# DISPATCHES to this kernel whenever its inputs are plain term cursors (or
# synonym groups, which merge exactly); phrase adapters keep the cursor
# loops (their match set depends on position verification).
#
# Result identity is by construction, not approximation:
#   * contributions use the same float64 expression, and each doc's score
#     accumulates in the SAME order as the walks (ascending term within a
#     group/should list, groups in caller order, shoulds last) — an exact
#     IEEE-754 left-fold match, asserted against the cursor walks in
#     tests/test_index.py;
#   * the masks (deleted / allowed / cursor-paging `after`) and the
#     (score desc, doc_id asc) top-k tie-break replicate `offer()`.
# Per-part memory is O(postings of the query's terms in the part) — the
# same bound the decode-stream kernels already carry at scale.
# ---------------------------------------------------------------------------

def _decode_term_arrays(blocks: list) -> tuple:
    """One term's sorted block list → (ids, tf_f64, dl_f64) arrays."""
    ids_l, tfs_l, dls_l = [], [], []
    for b in blocks:
        i, t, d = unpack_block(
            bytes(b["ids_bin"]), bytes(b["tfs_bin"]), bytes(b["dls_bin"]))
        ids_l.append(i)
        tfs_l.append(t)
        dls_l.append(d)
    return (np.concatenate(ids_l),
            np.concatenate(tfs_l).astype(np.float64),
            np.concatenate(dls_l).astype(np.float64))


def _cursor_unit(c: "_Cursor") -> tuple:
    """Decode a plain cursor's FULL block list to scoring arrays:
    (idf, ids, tf_f64, dl_f64)."""
    return (c.idf, *_decode_term_arrays(c.blocks))


def _syn_unit(c: "_SynCursor") -> tuple:
    """Merge a synonym group to one pseudo-term unit: tf at a doc is the
    SUM of member tfs (integer-valued floats — order-independent exact),
    dl is the doc's length (identical across members by construction)."""
    parts = [_cursor_unit(m) for m in c.members]
    ids_c = np.concatenate([p[1] for p in parts])
    tfs_c = np.concatenate([p[2] for p in parts])
    dls_c = np.concatenate([p[3] for p in parts])
    uids, inv = np.unique(ids_c, return_inverse=True)
    tf_sum = np.zeros(len(uids))
    np.add.at(tf_sum, inv, tfs_c)
    dl_u = np.zeros(len(uids))
    dl_u[inv] = dls_c
    return (c.idf, uids, tf_sum, dl_u)


def _vec_topk(
    groups: list[list[tuple]], shoulds: list[tuple], k: int, avgdl: float,
    deleted: np.ndarray | None = None, allowed: np.ndarray | None = None,
    after: tuple[int, float] | None = None, min_should_match: int = 0,
    min_match: int | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k over scoring units (see module comment above).

    ``groups``: required at-least-one-of unit groups, in accumulation
    order (members already ordered); ``shoulds``: optional units, in
    accumulation order. ``min_match`` gates on the number of PRESENT
    should units (the _or_topk contract); ``min_should_match`` is the
    boolean walk's Lucene mm gate. Returns [(doc_id, score)] under
    (score desc, doc_id asc)."""
    all_ids = [u[1] for g in groups for u in g] + [u[1] for u in shoulds]
    all_ids = [a for a in all_ids if len(a)]
    if not all_ids or k <= 0:
        return []
    universe = np.unique(np.concatenate(all_ids))
    score = np.zeros(len(universe))
    ok = np.ones(len(universe), dtype=bool)

    def _contrib(idf, tfs, dls):
        # EXACTLY _Cursor.contribution()'s expression shape:
        # idf * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
        return (idf * tfs) / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    for g in groups:
        gpresent = np.zeros(len(universe), dtype=bool)
        for (idf, ids, tfs, dls) in g:
            idx = np.searchsorted(universe, ids)
            score[idx] += _contrib(idf, tfs, dls)
            gpresent[idx] = True
        ok &= gpresent
    scount = np.zeros(len(universe), dtype=np.int64)
    for (idf, ids, tfs, dls) in shoulds:
        idx = np.searchsorted(universe, ids)
        score[idx] += _contrib(idf, tfs, dls)
        scount[idx] += 1
    if min_match is not None:
        ok &= scount >= min_match
    if min_should_match:
        ok &= scount >= min_should_match
    if deleted is not None and len(deleted):
        pos = np.searchsorted(deleted, universe)
        pos_c = np.minimum(pos, len(deleted) - 1)
        ok &= ~((pos < len(deleted)) & (deleted[pos_c] == universe))
    if allowed is not None:
        if not len(allowed):
            return []
        pos = np.searchsorted(allowed, universe)
        pos_c = np.minimum(pos, len(allowed) - 1)
        ok &= (pos < len(allowed)) & (allowed[pos_c] == universe)
    if after is not None:
        a_doc, a_score = after
        ok &= (score < a_score) | ((score == a_score) & (universe > a_doc))
    cand = np.flatnonzero(ok)
    if not len(cand):
        return []
    cs = score[cand]
    order = np.lexsort((universe[cand], -cs))[:k]
    return [(int(universe[cand[i]]), float(cs[i])) for i in order]


def _vec_ok(cursors) -> bool:
    return all(type(c) is _Cursor for c in cursors)


def _vec_or_units(cursors) -> list[tuple] | None:
    """Units for a should/OR list that may mix plain and synonym cursors
    (ascending .term order — the walks' accumulation order); None if any
    member is a phrase adapter (position-dependent: cursor walk only).
    Type-checks the WHOLE list before decoding anything, so a mixed list
    costs nothing here."""
    if not all(type(c) in (_Cursor, _SynCursor) for c in cursors):
        return None
    return [
        _cursor_unit(c) if type(c) is _Cursor else _syn_unit(c)
        for c in sorted(cursors, key=lambda c: c.term)
    ]


def _and_topk(
    cursors: list[_Cursor], k: int, n_required: int,
    deleted: np.ndarray | None = None, allowed: np.ndarray | None = None,
    after: tuple[int, float] | None = None,
) -> list[tuple[int, float]]:
    """Conjunctive (pure-AND) exact top-k: leapfrog intersection of the
    term cursors, BM25-scored, (score desc, doc_id asc) tie-break.

    ``n_required`` is the number of query terms that exist in the INDEX
    (globally): a caller holding cursors for fewer terms (e.g. one part
    bucket of a distributed walk where a term has no postings) can match
    nothing, keeping per-part results exact. ``after``: the previous
    page's last ``(doc_id, score)`` hit (see :func:`_wand_topk`)."""
    if k <= 0 or n_required <= 0 or len(cursors) < n_required:
        return []
    if _vec_ok(cursors):
        # conjunctive = every term its own required singleton group, in
        # ascending-term order (the walk's per-doc summation order)
        groups = [[_cursor_unit(c)]
                  for c in sorted(cursors, key=lambda c: c.term)]
        return _vec_topk(groups, [], k, cursors[0].avgdl,
                         deleted=deleted, allowed=allowed, after=after)
    heap: list[tuple[float, int]] = []
    after_item = (after[1], -after[0]) if after is not None else None

    def offer(doc: int, score: float) -> None:
        if _in_sorted(deleted, doc):
            return
        if allowed is not None and not _in_sorted(allowed, doc):
            return
        item = (score, -doc)
        if after_item is not None and item >= after_item:
            return  # at or before the page cursor: already served
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    while True:
        if any(c.exhausted for c in cursors):
            break
        target = max(c.cur_doc for c in cursors)
        for c in cursors:
            if c.cur_doc < target:
                c.next_geq(target)
        if any(c.exhausted for c in cursors):
            break
        if all(c.cur_doc == target for c in cursors):
            score = 0.0
            for c in sorted(cursors, key=lambda c: c.term):
                score += c.contribution()
            offer(target, score)
            for c in cursors:
                c.advance()

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


def _boolean_topk(
    must: list["_Cursor"], should: list["_Cursor"], k: int,
    n_required: int, deleted: np.ndarray | None = None,
    allowed: np.ndarray | None = None, min_should_match: int = 0,
) -> list[tuple[int, float]]:
    """Mixed MUST/SHOULD exact top-k (Lucene BooleanQuery under BM25):
    leapfrog intersection over the MUST cursors defines the match set;
    SHOULD cursors are forward-only riders that add their contribution
    whenever they align with a matched doc (they gate matching only when
    ``min_should_match`` > 0 — Lucene's minimumNumberShouldMatch: a doc
    must additionally align ≥ that many SHOULD cursors). MUST_NOT is
    handled upstream by merging the prohibited ids into ``deleted``.
    Same (score desc, doc_id asc) tie-break as every walk."""
    if k <= 0 or n_required <= 0 or len(must) < n_required:
        return []
    if min_should_match > len(should):
        return []  # fewer optional clauses than required matches
    if _vec_ok(must) and _vec_ok(should):
        groups = [[_cursor_unit(c)]
                  for c in sorted(must, key=lambda c: c.term)]
        shoulds = [_cursor_unit(c)
                   for c in sorted(should, key=lambda c: c.term)]
        return _vec_topk(groups, shoulds, k, must[0].avgdl,
                         deleted=deleted, allowed=allowed,
                         min_should_match=min_should_match)
    heap: list[tuple[float, int]] = []

    def offer(doc: int, score: float) -> None:
        if _in_sorted(deleted, doc):
            return
        if allowed is not None and not _in_sorted(allowed, doc):
            return
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    should_sorted = sorted(should, key=lambda c: c.term)
    while True:
        if any(c.exhausted for c in must):
            break
        target = max(c.cur_doc for c in must)
        for c in must:
            if c.cur_doc < target:
                c.next_geq(target)
        if any(c.exhausted for c in must):
            break
        if all(c.cur_doc == target for c in must):
            score = 0.0
            matched_should = 0
            for c in sorted(must, key=lambda c: c.term):
                score += c.contribution()
            for c in should_sorted:
                if not c.exhausted and c.cur_doc < target:
                    c.next_geq(target)
                if not c.exhausted and c.cur_doc == target:
                    score += c.contribution()
                    matched_should += 1
            if matched_should >= min_should_match:
                offer(target, score)
            for c in must:
                c.advance()

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


def _grouped_topk(
    groups: list[list["_Cursor"]], should: list["_Cursor"], k: int,
    deleted: np.ndarray | None = None, allowed: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Generalized MUST walk for expanded multi-term clauses (wildcard /
    fuzzy): each group is an at-least-one-of disjunction and EVERY group
    must be satisfied — the match set is ∩_g (∪_{t∈g} postings(t)), i.e.
    Lucene's ``+(a b c)`` nested-BooleanQuery shape after a MultiTermQuery
    rewrite. A plain MUST term is a singleton group, so this walk strictly
    generalizes :func:`_boolean_topk`'s intersection.

    Leapfrog over VIRTUAL group cursors: a group's current doc is the min
    over its members (exhausted members report the sentinel); lagging
    groups ``next_geq`` to the max. At an aligned doc the score sums every
    aligned member's contribution (members sorted by term within a group,
    groups in caller order — the fixed float-summation order the
    determinism discipline requires), plus SHOULD riders exactly as in
    :func:`_boolean_topk`. MUST_NOT is handled upstream via ``deleted``.
    Same (score desc, doc_id asc) tie-break as every walk."""
    if k <= 0 or not groups or any(not g for g in groups):
        return []
    if all(_vec_ok(g) for g in groups) and _vec_ok(should):
        # groups in caller order, members ascending-term within each, then
        # should riders ascending-term — the walk's exact summation order
        vg = [[_cursor_unit(c) for c in sorted(g, key=lambda c: c.term)]
              for g in groups]
        vs = [_cursor_unit(c) for c in sorted(should, key=lambda c: c.term)]
        return _vec_topk(vg, vs, k, groups[0][0].avgdl,
                         deleted=deleted, allowed=allowed)
    heap: list[tuple[float, int]] = []

    def offer(doc: int, score: float) -> None:
        if _in_sorted(deleted, doc):
            return
        if allowed is not None and not _in_sorted(allowed, doc):
            return
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    def g_doc(g: list["_Cursor"]) -> int:
        return min(c.cur_doc for c in g)  # exhausted → sentinel 1 << 62

    sentinel = 1 << 62
    should_sorted = sorted(should, key=lambda c: c.term)
    while True:
        target = max(g_doc(g) for g in groups)
        if target >= sentinel:
            break  # some group fully exhausted: no further matches
        aligned = True
        for g in groups:
            for c in g:
                if not c.exhausted and c.cur_doc < target:
                    c.next_geq(target)
            if g_doc(g) != target:
                aligned = False
        if not aligned:
            continue  # next_geq strictly advanced a group past target
        score = 0.0
        for g in groups:
            for c in sorted(g, key=lambda c: c.term):
                if not c.exhausted and c.cur_doc == target:
                    score += c.contribution()
        for c in should_sorted:
            if not c.exhausted and c.cur_doc < target:
                c.next_geq(target)
            if not c.exhausted and c.cur_doc == target:
                score += c.contribution()
        offer(target, score)
        for g in groups:
            for c in g:
                if not c.exhausted and c.cur_doc == target:
                    c.advance()

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


def _or_topk(
    cursors: list, k: int,
    deleted: np.ndarray | None = None, allowed: np.ndarray | None = None,
    min_match: int = 1, after: tuple[int, float] | None = None,
) -> list[tuple[int, float]]:
    """Exact disjunctive top-k WITHOUT block-max pruning: the walk for
    should-only clause mixes that include phrase cursors (which provide no
    block bounds, so WAND would be unsound) and for
    ``min_should_match`` > 1 term queries (Lucene's
    MinShouldMatchSumScorer shape: a doc needs ≥ ``min_match`` aligned
    cursors to match). Doc-at-a-time min-merge over all live cursors;
    contributions summed in ascending ``.term`` order (the determinism
    discipline). Every candidate is evaluated — exact by construction,
    and the cost is bounded by the clauses' postings like the exhaustive
    scorer's."""
    if k <= 0 or min_match > len(cursors):
        return []
    units = _vec_or_units(cursors) if cursors else []
    if units is not None:
        return _vec_topk([], units, k, cursors[0].avgdl if cursors else 0.0,
                         deleted=deleted, allowed=allowed, after=after,
                         min_match=min_match)
    heap: list[tuple[float, int]] = []
    after_item = (after[1], -after[0]) if after is not None else None

    def offer(doc: int, score: float) -> None:
        if _in_sorted(deleted, doc):
            return
        if allowed is not None and not _in_sorted(allowed, doc):
            return
        item = (score, -doc)
        if after_item is not None and item >= after_item:
            return  # at or before the page cursor: already served
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    order = sorted(cursors, key=lambda c: c.term)
    while True:
        live = [c for c in order if not c.exhausted]
        if not live:
            break
        doc = min(c.cur_doc for c in live)
        at_doc = [c for c in live if c.cur_doc == doc]
        if len(at_doc) >= min_match:
            offer(doc, sum(c.contribution() for c in at_doc))
        for c in at_doc:
            c.advance()

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


def _drain_phrase_ids(pc: "_PhraseCursor") -> np.ndarray:
    """All doc ids a phrase matches (its cursor only lands on pf>0 docs) —
    the exclusion set of a prohibited phrase, computed WHERE THE WALK RUNS
    exactly like MUST_NOT terms' ids-only decode."""
    ids = []
    while not pc.exhausted:
        ids.append(pc.cur_doc)
        pc.advance()
    return np.array(ids, dtype=np.int64)


def _mixed_walk(
    by_term: dict[str, list], base_idfs: dict[str, float], avgdl: float,
    term_groups: list[tuple[list[str], float]],
    should_terms: list[tuple[str, float]],
    phrases: list[tuple[list[str], bool, float, int]],
    k: int,
    deleted: np.ndarray | None, allowed: np.ndarray | None,
    not_phrases: list[tuple[list[str], int]] = (),
) -> list[tuple[int, float]]:
    """Build cursors from decoded-block lists and run the right walk for a
    MIXED clause set (terms + phrases) — the one scorer-tree composition
    shared by the driver path, the per-part distributed kernel and the SQL
    surface's worker (same spec in → bit-identical hits out).

    ``term_groups`` = MUST at-least-one-of groups (plain MUST terms arrive
    as singletons); ``should_terms`` = (term, boost) riders; ``phrases`` =
    (tokens, required?, boost, slop) clauses wrapped in
    :class:`_PhraseCursor` (required → their own singleton group, optional
    → riders). A required clause with no member present here returns ∅ —
    globally that is Lucene's MatchNoDocs; per part it correctly yields an
    empty local top-k. Any MUST clause present → grouped walk; otherwise
    the non-pruning OR walk (phrase cursors carry no block-max bounds).
    ``not_phrases`` = (tokens, slop) prohibited phrases: their match ids
    are drained into the deleted set here (where the walk runs — the
    exclusion set never crosses the network, like MUST_NOT terms); a
    prohibited phrase missing a member term here excludes nothing."""
    for toks, slop in not_phrases:
        uniq = sorted(set(toks))
        if any(t not in by_term for t in uniq):
            continue  # phrase cannot occur: nothing to exclude
        zero_idfs = {t: 0.0 for t in uniq}  # exclusions never score
        pc = _PhraseCursor(toks, zero_idfs, by_term, avgdl, slop=slop)
        deleted = _merge_deleted(deleted, _drain_phrase_ids(pc))
    groups: list[list] = []
    for g, b in term_groups:
        cs = [_Cursor(t, base_idfs[t] * b, by_term[t], avgdl)
              for t in g if t in by_term and t in base_idfs]
        if not cs:
            return []
        groups.append(cs)
    riders: list = [
        _Cursor(t, base_idfs[t] * b, by_term[t], avgdl)
        for t, b in should_terms if t in by_term and t in base_idfs
    ]
    for toks, required, b, slop in phrases:
        uniq = sorted(set(toks))
        if any(t not in by_term or t not in base_idfs for t in uniq):
            if required:
                return []
            continue
        pc = _PhraseCursor(toks, base_idfs, by_term, avgdl,
                           slop=slop, boost=b)
        if required:
            groups.append([pc])
        else:
            riders.append(pc)
    if groups:
        return _grouped_topk(groups, riders, k, deleted=deleted,
                             allowed=allowed)
    return _or_topk(riders, k, deleted=deleted, allowed=allowed)


def _mixed_spec(p, expansions):
    """ParsedQuery + its expanded multi-term clauses → the mixed-walk spec
    ``(term_groups, should_terms, must_not, phrases)`` shared by
    ``IndexReader.search_lucene`` and the SQL surface (same spec in →
    bit-identical hits out of :func:`_mixed_walk`). Plain MUST terms become
    sorted singleton groups (dedup first-boost-wins); MUST expansions keep
    parse order after them; SHOULD terms/expansions dedup first-boost-wins
    and drop terms already gating a group (the same rule the non-phrase
    grouped path applies); prohibited phrases pass through as
    (tokens, slop) exclusions. Returns ``None`` when an empty MUST
    expansion makes the whole query MatchNoDocs."""
    must_not = list(p.must_not)
    should: list[tuple[str, float]] = list(p.should)
    exp_groups: list[tuple[list[str], float]] = []
    for exp, occ, b in expansions:
        if occ == "-":
            must_not.extend(exp)
        elif occ == "+":
            if not exp:
                return None
            exp_groups.append((sorted(set(exp)), b))
        else:
            should.extend((t, b) for t in exp)
    must_dedup: dict[str, float] = {}
    for t, b in p.must:
        must_dedup.setdefault(t, b)
    term_groups = ([([t], b) for t, b in sorted(must_dedup.items())]
                   + exp_groups)
    gterms = {t for g, _ in term_groups for t in g}
    sd: dict[str, float] = {}
    for t, b in should:
        if t not in gterms:
            sd.setdefault(t, b)
    phrases = [(list(toks), required, b, slop)
               for toks, required, b, slop in p.phrases]
    not_phrases = [(list(toks), slop) for toks, slop in p.not_phrases]
    return (term_groups, sorted(sd.items()), sorted(set(must_not)),
            phrases, not_phrases)


def _excluded_ids(recs: list) -> np.ndarray:
    """Sorted unique doc ids from a list of block records (Row or dict) —
    the MUST_NOT exclusion set, decoded ids-only (no tf/dl)."""
    if not recs:
        return np.empty(0, dtype=np.int64)
    parts = [delta_decode(varbyte_decode(bytes(r["ids_bin"]))) for r in recs]
    return np.unique(np.concatenate(parts))


def _merge_deleted(a: np.ndarray | None, b: np.ndarray) -> np.ndarray | None:
    if not len(b):
        return a
    if a is None or not len(a):
        return b
    return np.union1d(a, b)


def _phrase_freq(terms: list[str], cursors: dict[str, "_Cursor"],
                 slop: int = 0) -> int:
    """Phrase frequency at the doc all cursors are aligned on.

    ``slop=0`` (exact, Lucene PhraseQuery): the count of start positions p
    with term_i at p+i for every phrase slot — an intersection of the
    slot-shifted (sorted, unique) position lists, short-circuit on empty.

    ``slop>0`` (sloppy): ORDERED near-match semantics — Lucene
    SpanNearQuery(inOrder=true, slop) rather than classic PhraseQuery's
    transposing sloppy scorer (documented deviation; the classic parser's
    ``"a b"~N`` maps here). A match anchored at a start position q of
    term_0 exists iff the GREEDY chain (each next term at its smallest
    position strictly greater than the previous slot's) spans ≤ slop
    intervening non-matched positions: width = p_last − q − (m−1) ≤ slop.
    Greedy minimizes the final position for a given start, so it decides
    existence exactly; pf = number of matching start positions, unweighted
    (vs Lucene's 1/(distance+1) weighting — deviation documented in
    ``IndexReader.search_phrase``). Degenerates to the exact count at
    slop=0 (asserted in tests)."""
    if slop == 0:
        base: np.ndarray | None = None
        for i, t in enumerate(terms):
            p = cursors[t].cur_positions() - i
            base = p if base is None else np.intersect1d(
                base, p, assume_unique=True)
            if base.size == 0:
                return 0
        return int(base.size)
    pos_lists = [cursors[t].cur_positions() for t in terms]
    starts = pos_lists[0].astype(np.int64)
    prev = starts
    alive = np.ones(len(starts), dtype=bool)
    for p in pos_lists[1:]:
        idx = np.searchsorted(p, prev, side="right")
        ok = idx < len(p)
        alive &= ok
        prev = np.where(ok, p[np.minimum(idx, len(p) - 1)], prev)
        if not alive.any():
            return 0
    width = prev - starts - (len(terms) - 1)
    return int(np.count_nonzero(alive & (width <= slop)))


def _phrase_topk(
    terms: list[str], cursors: dict[str, "_Cursor"], idf_sum: float,
    k: int, avgdl: float,
    deleted: np.ndarray | None = None, allowed: np.ndarray | None = None,
    slop: int = 0,
) -> list[tuple[int, float]]:
    """Phrase top-k: conjunctive leapfrog over the distinct terms'
    cursors (same loop as :func:`_and_topk`), position verification +
    phrase-frequency scoring only at aligned docs. ``slop`` relaxes the
    position check to ordered near-match (see :func:`_phrase_freq`) — the
    AND prefilter is unchanged (every phrase term must occur in the doc
    regardless of slop)."""
    cs = list(cursors.values())
    if k <= 0 or not cs:
        return []
    heap: list[tuple[float, int]] = []

    def offer(doc: int, score: float) -> None:
        if _in_sorted(deleted, doc):
            return
        if allowed is not None and not _in_sorted(allowed, doc):
            return
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    while True:
        if any(c.exhausted for c in cs):
            break
        target = max(c.cur_doc for c in cs)
        for c in cs:
            if c.cur_doc < target:
                c.next_geq(target)
        if any(c.exhausted for c in cs):
            break
        if all(c.cur_doc == target for c in cs):
            pf = _phrase_freq(terms, cursors, slop)
            if pf:
                c0 = cs[0]
                dl = float(c0.dls[c0.pos])
                score = idf_sum * pf / (pf + _norm(dl, avgdl))
                offer(target, score)
            for c in cs:
                c.advance()

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


def _wand_topk(
    cursors: list[_Cursor], k: int, deleted: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
    after: tuple[int, float] | None = None,
) -> list[tuple[int, float]]:
    """Exact disjunctive top-k under (score desc, doc_id asc).

    Plain term cursors dispatch to the vectorized exact scorer
    (``_vec_topk`` — r6: one columnar pass beats per-posting interpreted
    skipping by ~2 orders of magnitude at any realistic selectivity);
    non-plain cursor mixes run the block-max WAND loop below. Either way
    the result is the exact top-k: WAND's pruning uses strict ``ub < θ``
    so boundary ties are always evaluated — exactness over marginal
    pruning (SURVEY.md §4.3.3 correctness guard) — and the kernel skips
    nothing at all.

    ``deleted``: sorted tombstoned doc_ids (Lucene deleted-docs visibility
    filter) — tombstoned docs are evaluated but never admitted to the heap.
    ``allowed``: optional sorted visibility allowlist (the fq-filtered
    search surface) — docs outside it are evaluated but never admitted.
    ``after``: cursor-paging mark — the previous page's last hit
    ``(doc_id, score)`` exactly as these methods return hits (Lucene
    ``searchAfter`` / Solr cursorMark): only docs STRICTLY after it in
    (score desc, doc_id asc) result order are admitted, so consecutive
    pages partition the full ranking with no overlap and no drift
    regardless of how deep the caller pages.
    """
    if k <= 0:
        return []
    if _vec_ok(cursors):
        units = [_cursor_unit(c)
                 for c in sorted(cursors, key=lambda c: c.term)]
        return _vec_topk([], units, k, cursors[0].avgdl if cursors else 0.0,
                         deleted=deleted, allowed=allowed, after=after)
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    after_item = (after[1], -after[0]) if after is not None else None

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else -math.inf

    def offer(doc: int, score: float) -> None:
        if _in_sorted(deleted, doc):
            return
        if allowed is not None and not _in_sorted(allowed, doc):
            return
        item = (score, -doc)
        if after_item is not None and item >= after_item:
            return  # at or before the page cursor: already served
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    live = [c for c in cursors if not c.exhausted]
    while live:
        live = [c for c in live if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc)
        # find pivot: smallest prefix whose UB sum can beat θ
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.global_ub
            # ">=" (not ">") so exact-tie candidates at θ are still evaluated
            # — required for rank-identity under the doc_id tie-break
            if acc >= theta():
                pivot_idx = i
                break
        if pivot_idx == -1:
            break  # no remaining doc can enter the heap
        pivot_doc = live[pivot_idx].cur_doc
        if live[0].cur_doc == pivot_doc:
            # block-max refinement: per-block bounds at the pivot
            block_acc = 0.0
            for c in live:
                if c.cur_doc > pivot_doc:
                    break
                c.next_geq(pivot_doc)  # ensures current block contains ≥ pivot
                if not c.exhausted and c.cur_doc <= c.block_last():
                    block_acc += c.block_ub()
            if len(heap) >= k and block_acc < theta():
                # skip: docs in [pivot, target) live only in the pivot
                # cursors (all others sit at ≥ next_cur) and are bounded by
                # block_acc < θ while ≤ every pivot cursor's block_last —
                # so the jump target is min(shallowest block boundary + 1,
                # next non-pivot cursor position). (Ding & Suel 2011, BMW.)
                boundary = min(
                    c.block_last() for c in live if c.cur_doc <= pivot_doc
                )
                next_cur = min(
                    (c.cur_doc for c in live if c.cur_doc > pivot_doc),
                    default=1 << 62,
                )
                target = min(boundary + 1, next_cur)
                for c in live:
                    if c.cur_doc <= pivot_doc:
                        c.next_geq(target)
                continue
            # full evaluation, summing in ascending-term order
            score = 0.0
            for c in sorted(
                (c for c in live if c.cur_doc == pivot_doc),
                key=lambda c: c.term,
            ):
                score += c.contribution()
            offer(pivot_doc, score)
            for c in live:
                if c.cur_doc == pivot_doc:
                    c.advance()
        else:
            # advance the laggard with the largest upper bound (classic pick)
            laggards = [c for c in live if c.cur_doc < pivot_doc]
            mover = max(laggards, key=lambda c: c.global_ub)
            mover.next_geq(pivot_doc)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]
