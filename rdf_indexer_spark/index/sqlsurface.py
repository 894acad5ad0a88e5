"""SQL surface for the index: ``SELECT * FROM bm25_search('query', k)``.

The reference's users query Solr over HTTP (SolrClient.java:125-201); this
engine's downstream users get a SQL table-valued entry instead, so BM25
top-k composes with plain Spark SQL (joins against the docstore, filters,
CTEs) without touching the Python API.

Shape: a Python UDTF (Spark 4 table function). The UDTF executes on a
worker, where no SparkSession exists — so it does NOT route through the
driver-side ``IndexReader``. Instead it reads the query's posting blocks
straight from the index parquet with pyarrow (``term``-filtered, so parquet
row-group statistics prune the scan exactly like the DataFrame path) and
runs the same `_wand_topk` cursor walk ``IndexReader.search_wand`` uses —
rank- and score-identical by construction (shared code, shared tokenizer,
shared idf formula; asserted in tests/test_index.py).

At cluster scale this is the "serving" shape: the search runs as ONE task
wherever Spark schedules it, nothing is collected to the driver, and the
block fetch is bounded by the query's terms. (For hot multi-TB terms the
distributed per-bucket walk in bm25.search_wand_distributed remains the
right path; the UDTF is the SQL-facing point-query surface.)

Usage::

    register_sql_surface(spark, index_dir)
    spark.sql("SELECT doc_id, score, rank FROM bm25_search('hello world', 10)")
"""

from __future__ import annotations

import math
import os

import numpy as np


def _load_reader_state(index_dir: str) -> dict:
    """Worker-side index metadata load (pyarrow, no SparkSession)."""
    import pyarrow.parquet as pq

    stats = pq.read_table(os.path.join(index_dir, "stats")).to_pylist()[0]
    tomb_path = os.path.join(index_dir, "tombstones")
    if os.path.exists(tomb_path):
        tomb = np.sort(
            pq.read_table(tomb_path, columns=["doc_id"])["doc_id"]
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
    else:
        tomb = np.array([], dtype=np.int64)
    return {
        "n_docs": int(stats["n_docs"]),
        "avgdl": float(stats["avgdl"]),
        "tombstones": tomb,
    }


def _allowed_local(index_dir: str, where: str | None) -> np.ndarray | None:
    """Worker-side fq evaluation: SQL predicate over the docstore → sorted
    visible doc_id set (the ``where`` surface of the SQL point-query path).

    No SparkSession exists on the worker, so the predicate is evaluated by
    DuckDB over the hive-partitioned docstore parquet — projection is just
    ``doc_id`` and the predicate pushes into the parquet scan (row-group
    zonemaps), so the cost is a pruned columnar scan, not a docstore read.
    Simple fq shapes (equality / ranges / IN / arithmetic / AND-OR) mean
    the same thing in DuckDB and Spark SQL; this mirrors how Solr evaluates
    fq inside the index rather than in the client (SolrClient.java:144-163).
    For unselective predicates over a multi-TB docstore the distributed
    cogrouped walk (bm25.search_wand_distributed) remains the right path —
    this is the single-task serving surface."""
    if where is None:
        return None
    import duckdb

    glob = os.path.join(index_dir, "docstore", "*", "*.parquet")
    con = duckdb.connect()
    try:
        ids = con.execute(
            f"SELECT doc_id FROM read_parquet('{glob}', hive_partitioning=1) "
            f"WHERE {where}"
        ).fetchnumpy()["doc_id"]
    finally:
        con.close()
    return np.sort(np.asarray(ids, dtype=np.int64))


def _expand_local(index_dir: str, p) -> list[tuple[list[str], str, float]]:
    """Worker-side wildcard/fuzzy expansion against the term dictionary —
    the SQL-surface twin of ``IndexReader.expand_wildcard`` /
    ``expand_fuzzy``: no SparkSession on the worker, so the termstats scan
    runs in DuckDB over the dictionary parquet with the SAME anchored
    regex / classic-levenshtein predicates and the SAME deterministic
    (rank, df desc, term asc) caps, so the SQL surface stays rank- and
    score-identical to the driver path (asserted in tests). Returns one
    ``(expanded_terms, occur, boost)`` entry per multi-term clause."""
    if not p.wildcards and not p.fuzzies:
        return []
    import duckdb

    from .bm25 import IndexReader
    from .qparse import wildcard_regex

    glob = os.path.join(index_dir, "termstats", "*.parquet")
    con = duckdb.connect()
    out: list[tuple[list[str], str, float]] = []
    try:
        for pat, occ, b in p.wildcards:
            rows = con.execute(
                "SELECT term FROM read_parquet(?) "
                "WHERE regexp_matches(term, ?) "
                "ORDER BY df DESC, term ASC LIMIT ?",
                [glob, wildcard_regex(pat), IndexReader.MAX_WILDCARD_EXPANSIONS],
            ).fetchall()
            out.append(([r[0] for r in rows], occ, b))
        for t, e, occ, b in p.fuzzies:
            rows = con.execute(
                "SELECT term FROM read_parquet(?) "
                "WHERE abs(length(term) - ?) <= ? "
                "AND levenshtein(term, ?) <= ? "
                "ORDER BY levenshtein(term, ?) ASC, df DESC, term ASC "
                "LIMIT ?",
                [glob, len(t), e, t, e, t,
                 IndexReader.MAX_FUZZY_EXPANSIONS],
            ).fetchall()
            out.append(([r[0] for r in rows], occ, b))
    finally:
        con.close()
    return out


def _mixed_local(index_dir: str, spec, k: int,
                 where: str | None = None) -> list[tuple[int, float]]:
    """Worker-side mixed scorer tree (phrases interleaved with boolean
    clauses): pyarrow-fetched blocks WITH positions into the shared
    ``bm25._mixed_walk`` — the SQL-surface twin of
    ``IndexReader._search_mixed``."""
    import math as _math

    import pyarrow.parquet as pq

    from .bm25 import _excluded_ids, _merge_deleted, _mixed_walk

    term_groups, should_terms, must_not, phrases, not_phrases = spec
    phrase_terms = {t for toks, *_ in phrases for t in toks}
    np_terms = {t for toks, _ in not_phrases for t in toks}
    scored = sorted({t for g, _ in term_groups for t in g}
                    | {t for t, _ in should_terms} | phrase_terms)
    if not scored:
        return []
    state = _load_reader_state(index_dir)
    ts = pq.read_table(
        os.path.join(index_dir, "termstats"),
        filters=[("term", "in",
                  sorted(set(scored) | set(must_not) | np_terms))],
    ).to_pylist()
    indexed = {r["term"] for r in ts}
    for g, _ in term_groups:
        if not any(t in indexed for t in g):
            return []
    for toks, required, _, _ in phrases:
        if required and any(t not in indexed for t in toks):
            return []
    base_idfs = {
        r["term"]: _math.log(
            1.0 + (state["n_docs"] - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in ts if r["term"] in set(scored)
    }
    if not base_idfs:
        return []
    fetch = sorted(set(base_idfs) | set(must_not)
                   | (np_terms & indexed))
    blocks_tbl = pq.read_table(
        os.path.join(index_dir, "blocks"),
        columns=["term", "first_doc_id", "last_doc_id", "n", "max_tf",
                 "dl_min", "ids_bin", "tfs_bin", "dls_bin", "pos_bin"],
        filters=[("term", "in", fetch)],
    )
    by_term: dict[str, list] = {}
    for rec in blocks_tbl.to_pylist():
        by_term.setdefault(rec["term"], []).append(rec)
    for t in by_term:
        by_term[t].sort(key=lambda r: r["first_doc_id"])
    if any(r["pos_bin"] is None
           for t in (phrase_terms | np_terms) for r in by_term.get(t, [])):
        raise ValueError(
            "not a positional index: rebuild with "
            "build_index(positions=True) for phrase queries")
    allowed = _allowed_local(index_dir, where)
    if allowed is not None and not len(allowed):
        return []
    excluded = _excluded_ids(
        [r for t in must_not for r in by_term.get(t, [])])
    merged = _merge_deleted(state["tombstones"], excluded)
    return _mixed_walk(by_term, base_idfs, state["avgdl"], term_groups,
                       should_terms, phrases, k, merged, allowed,
                       not_phrases=not_phrases)


def _lucene_local(index_dir: str, query: str, k: int,
                  where: str | None = None,
                  mm: int = 0) -> list[tuple[int, float]]:
    """Worker-side Lucene classic-syntax search: parse the ``q`` string
    (qparse) and run the boolean walk over pyarrow-fetched blocks — the
    same MUST/SHOULD/MUST_NOT/boost semantics as
    ``IndexReader.search_boolean``, sharing `_boolean_topk` and the
    ids-only MUST_NOT decode. Lone unboosted phrase clauses route to
    phrase mode (slop honored); wildcard/fuzzy clauses expand via
    :func:`_expand_local` and MUST expansions run the shared grouped walk
    (`_grouped_topk`); phrase clauses mixed with other clauses (or
    boosted, or several) run the shared mixed scorer tree
    (`bm25._mixed_walk`) — identical spec construction to
    ``IndexReader.search_lucene``, so hits match the driver path
    bit-for-bit."""
    import pyarrow.parquet as pq

    from .bm25 import (_boolean_topk, _Cursor, _excluded_ids,
                       _grouped_topk, _merge_deleted, _mixed_spec,
                       _mixed_walk, _wand_topk)
    from .qparse import parse_query

    p = parse_query(query)
    if mm and (p.phrases or p.not_phrases or p.wildcards or p.fuzzies):
        raise ValueError(
            "mm (minimum should match) is supported for plain term "
            "clauses only — expanded/phrase clause counting differs "
            "from the flattened rewrite")
    if (len(p.phrases) == 1 and p.phrases[0][2] == 1.0
            and not (p.must or p.should or p.must_not or p.wildcards
                     or p.fuzzies or p.not_phrases)):
        toks, _required, _boost, slop = p.phrases[0]
        return _search_local(index_dir, " ".join(toks), k, "phrase", where,
                             slop=slop)
    if p.phrases or p.not_phrases:
        spec = _mixed_spec(p, _expand_local(index_dir, p))
        if spec is None:
            return []  # empty rewritten MUST clause: MatchNoDocs
        return _mixed_local(index_dir, spec, k, where)
    boosts: dict[str, float] = {}
    for t, b in [*p.must, *p.should]:
        boosts.setdefault(t, b)
    should_set = {t for t, _ in p.should}
    mn_set = set(p.must_not)
    groups: list[tuple[list[str], float]] = []
    for exp, occ, b in _expand_local(index_dir, p):
        if occ == "-":
            mn_set.update(exp)
        elif occ == "+":
            if not exp:
                return []  # empty rewritten MUST clause: MatchNoDocs
            groups.append((exp, b))
        else:
            should_set.update(exp)
            if b != 1.0:
                for t in exp:
                    boosts.setdefault(t, b)
    must_t = sorted({t for t, _ in p.must})
    group_terms = {t for g, _ in groups for t in g}
    should_t = sorted(should_set - set(must_t) - group_terms)
    mn_t = sorted(mn_set)
    scored = sorted(set(must_t) | set(should_t) | group_terms)
    if not scored:
        return []
    state = _load_reader_state(index_dir)
    ts = pq.read_table(
        os.path.join(index_dir, "termstats"),
        filters=[("term", "in", scored)],
    ).to_pylist()
    base_idfs = {
        r["term"]: math.log(
            1.0 + (state["n_docs"] - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in ts
    }
    idfs = {t: boosts.get(t, 1.0) * v for t, v in base_idfs.items()}
    if any(t not in idfs for t in must_t) or not idfs:
        return []
    fetch = sorted(set(idfs) | set(mn_t))
    blocks_tbl = pq.read_table(
        os.path.join(index_dir, "blocks"),
        columns=["term", "first_doc_id", "last_doc_id", "n", "max_tf",
                 "dl_min", "ids_bin", "tfs_bin", "dls_bin"],
        filters=[("term", "in", fetch)],
    )
    by_term: dict[str, list] = {}
    for rec in blocks_tbl.to_pylist():
        by_term.setdefault(rec["term"], []).append(rec)
    for t in by_term:
        by_term[t].sort(key=lambda r: r["first_doc_id"])
    allowed = _allowed_local(index_dir, where)
    if allowed is not None and not len(allowed):
        return []
    excluded = _excluded_ids(
        [r for t in mn_t for r in by_term.get(t, [])])
    merged = _merge_deleted(state["tombstones"], excluded)
    should_c = [_Cursor(t, idfs[t], by_term[t], state["avgdl"])
                for t in should_t if t in by_term]
    if groups:
        # grouped MUST walk — plain MUST terms ride as singleton groups,
        # expanded group members score base_idf · group boost
        gs = [[_Cursor(t, idfs[t], by_term[t], state["avgdl"])]
              for t in must_t if t in by_term]
        if len(gs) < len(must_t):
            return []
        for g, b in groups:
            cs = [_Cursor(t, base_idfs[t] * b, by_term[t], state["avgdl"])
                  for t in sorted(set(g)) if t in base_idfs and t in by_term]
            if not cs:
                return []
            gs.append(cs)
        return _grouped_topk(gs, should_c, k, deleted=merged,
                             allowed=allowed)
    must_c = [_Cursor(t, idfs[t], by_term[t], state["avgdl"])
              for t in must_t if t in by_term]
    if must_t:
        return _boolean_topk(must_c, should_c, k, len(must_t),
                             deleted=merged, allowed=allowed,
                             min_should_match=mm)
    if mm > 1:
        from .bm25 import _or_topk

        return _or_topk(should_c, k, deleted=merged, allowed=allowed,
                        min_match=mm)
    return _wand_topk(should_c, k, deleted=merged, allowed=allowed)


def _search_local(index_dir: str, query: str, k: int,
                  mode: str = "or",
                  where: str | None = None,
                  slop: int = 0, mm: int = 0,
                  after: tuple[int, float] | None = None,
                  ) -> list[tuple[int, float]]:
    """The full WAND walk against the on-disk index, no Spark involved.

    Reuses the exact cursor/walk implementation of the driver path
    (bm25._Cursor / bm25._wand_topk / bm25._and_topk) over pyarrow-fetched
    blocks. ``mode="and"`` = strict Lucene +required (every query term
    required; a term absent from the index matches nothing). ``where`` is
    the fq visibility filter (Solr q+fq: non-scoring), evaluated on the
    worker against the docstore — see :func:`_allowed_local`."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..analyzer import tokenize
    from .bm25 import _Cursor, _and_topk, _phrase_topk, _wand_topk

    if after is not None and mode not in ("or", "and"):
        raise ValueError("cursor paging (after) supports mode='or'/'and' "
                         "only")
    if mode == "lucene":
        return _lucene_local(index_dir, query, k, where, mm=mm)
    if mode not in ("or", "and", "phrase"):
        raise ValueError(f"unknown mode: {mode!r}")
    if mm and mode != "or":
        raise ValueError("mm applies to mode='or' or plain 'lucene' "
                         "queries only")
    state = _load_reader_state(index_dir)
    toks = tokenize(query)  # order + duplicates kept (phrase mode)
    terms = sorted(set(toks))
    if not terms:
        return []
    ts = pq.read_table(
        os.path.join(index_dir, "termstats"),
        filters=[("term", "in", terms)],
    ).to_pylist()
    idfs = {
        r["term"]: math.log(
            1.0 + (state["n_docs"] - r["df"] + 0.5) / (r["df"] + 0.5)
        )
        for r in ts
    }
    if not idfs:
        return []
    cols = ["term", "first_doc_id", "last_doc_id", "n", "max_tf",
            "dl_min", "ids_bin", "tfs_bin", "dls_bin"]
    if mode == "phrase":
        cols.append("pos_bin")
    blocks_tbl = pq.read_table(
        os.path.join(index_dir, "blocks"),
        columns=cols,
        filters=[("term", "in", list(idfs))],
    )
    by_term: dict[str, list] = {}
    for rec in blocks_tbl.to_pylist():
        by_term.setdefault(rec["term"], []).append(rec)
    for t in by_term:
        by_term[t].sort(key=lambda r: r["first_doc_id"])
    allowed = _allowed_local(index_dir, where)
    if allowed is not None and not len(allowed):
        return []  # predicate admits nothing: skip the walk
    if mode == "phrase":
        # Lucene PhraseQuery in SQL: every phrase term required; score =
        # (Σ idf with multiplicity) · pf/(pf + K(dl)) — identical walk to
        # IndexReader.search_phrase (shared _phrase_topk)
        if any(t not in idfs or t not in by_term for t in terms):
            return []
        if any(r["pos_bin"] is None
               for recs in by_term.values() for r in recs):
            raise ValueError(
                "not a positional index: rebuild with "
                "build_index(positions=True) for phrase queries")
        cursors_d = {
            t: _Cursor(t, idfs[t], by_term[t], state["avgdl"])
            for t in terms
        }
        idf_sum = sum(idfs[t] for t in toks)
        return _phrase_topk(toks, cursors_d, idf_sum, k, state["avgdl"],
                            deleted=state["tombstones"], allowed=allowed,
                            slop=slop)
    cursors = [
        _Cursor(t, idfs[t], by_term[t], state["avgdl"])
        for t in sorted(idfs) if t in by_term
    ]
    if mode == "and":
        # n_required = EVERY query term (same contract as search_wand)
        return _and_topk(cursors, k, len(terms), deleted=state["tombstones"],
                         allowed=allowed, after=after)
    if mm > 1:
        from .bm25 import _or_topk

        return _or_topk(cursors, k, deleted=state["tombstones"],
                        allowed=allowed, min_match=mm, after=after)
    return _wand_topk(cursors, k, deleted=state["tombstones"],
                      allowed=allowed, after=after)


def _facets_local(index_dir: str, query: str, fields: list[str],
                  top: int, mode: str,
                  where: str | None) -> list[tuple[str, str | None, int]]:
    """Worker-side facet.field counts — the SQL-surface twin of
    ``IndexReader.facet_counts``: ids-only block decode for the match set
    (pyarrow term-filtered read), docstore metadata columns masked by
    match ∩ visible − tombstones, per-field (n desc, value asc) top-N.
    Like the search UDTF this is the single-task serving surface; the
    cogrouped DataFrame kernel stays the multi-TB path."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ..analyzer import tokenize
    from .codec import delta_decode, varbyte_decode

    if mode not in ("or", "and"):
        raise ValueError(f"unknown mode: {mode!r}")
    state = _load_reader_state(index_dir)
    terms = sorted(set(tokenize(query))) if query not in ("", "*:*") else []
    matched: np.ndarray | None = None
    if terms:
        blocks_tbl = pq.read_table(
            os.path.join(index_dir, "blocks"),
            columns=["term", "ids_bin"],
            filters=[("term", "in", terms)],
        )
        per_term: dict[str, list] = {}
        for rec in blocks_tbl.to_pylist():
            ids = delta_decode(varbyte_decode(bytes(rec["ids_bin"])))
            per_term.setdefault(rec["term"], []).append(ids)
        if mode == "and" and len(per_term) < len(terms):
            return []
        sets = [np.unique(np.concatenate(v)) for v in per_term.values()]
        if not sets:
            return []
        matched = sets[0]
        for st in sets[1:]:
            matched = (np.intersect1d(matched, st, assume_unique=True)
                       if mode == "and"
                       else np.union1d(matched, st))
    doc_tbl = pq.read_table(
        os.path.join(index_dir, "docstore"),
        columns=["doc_id", *fields],
    ).to_pandas()
    mask = np.ones(len(doc_tbl), dtype=bool)
    if matched is not None:
        mask &= np.isin(doc_tbl["doc_id"].values.astype(np.int64), matched)
    if len(state["tombstones"]):
        mask &= ~np.isin(doc_tbl["doc_id"].values.astype(np.int64),
                         state["tombstones"])
    allowed = _allowed_local(index_dir, where)
    if allowed is not None:
        mask &= np.isin(doc_tbl["doc_id"].values.astype(np.int64), allowed)
    sub = doc_tbl[mask]
    out: list[tuple[str, str | None, int]] = []
    for f_name in fields:
        vc = sub[f_name].astype("object").value_counts(dropna=False)
        rows = sorted(
            ((None if pd.isna(v) else str(v), int(n))
             for v, n in vc.items()),
            key=lambda x: (-x[1], x[0] if x[0] is not None else "\uffff"),
        )[:top]
        out.extend((f_name, v, n) for v, n in rows)
    return out


def register_sql_surface(spark, index_dir: str, name: str = "bm25_search"):
    """Register ``name(query, k[, mode[, where]])`` as a SQL table function
    for ``index_dir`` — mode 'or' (default), 'and' (strict +required, the
    Solr ``+term`` surface in SQL), 'phrase' (exact consecutive
    sequence over a positional index — the Lucene ``"quoted phrase"``
    surface; requires ``build_index(positions=True)``), or 'lucene'
    (the full classic query string: ``+must -not term^boost`` and lone
    quoted phrases, parsed by qparse and run through the boolean
    walk — ``IndexReader.search_lucene`` in SQL); ``where`` is an
    optional fq visibility predicate over the docstore (the Solr q+fq
    composition — relevance plus a non-scoring filter), evaluated
    index-side on the worker exactly like ``IndexReader.search(where=...)``;
    ``mm`` is Lucene's minimumNumberShouldMatch (Solr dismax ``mm``) for
    'or' and plain-clause 'lucene' queries, as in
    ``IndexReader.search_boolean(min_should_match=...)``; ``after_doc`` +
    ``after_score`` are the previous page's last row (Solr cursorMark in
    SQL — stateless deep paging, modes 'or'/'and', see
    ``IndexReader.search(after=...)``).

    Returns the registered UDTF handle. The index path is bound at
    registration time (SQL callers pass only query/k/mode/where/mm)."""
    from pyspark.sql.functions import udtf

    class BM25Search:
        def eval(self, query: str, k: int, mode: str = "or",
                 where: str = None, mm: int = 0,
                 after_doc: int = None, after_score: float = None):
            after = None
            if after_doc is not None or after_score is not None:
                if after_doc is None or after_score is None:
                    raise ValueError(
                        "cursor paging needs BOTH after_doc and "
                        "after_score (the previous page's last row)")
                after = (int(after_doc), float(after_score))
            for rank, (doc, score) in enumerate(
                _search_local(index_dir, query, int(k), mode, where,
                              mm=int(mm or 0), after=after)
            ):
                yield int(doc), float(score), rank + 1

    fn = udtf(BM25Search, returnType="doc_id long, score double, rank int")
    spark.udtf.register(name, fn)

    class BM25Facets:
        def eval(self, query: str, fields: str, top: int = 10,
                 mode: str = "or", where: str = None):
            flist = [f.strip() for f in fields.split(",") if f.strip()]
            if not flist:
                raise ValueError("bm25_facets needs a comma-separated "
                                 "field list")
            for row in _facets_local(index_dir, query, flist, int(top),
                                     mode, where):
                yield row

    facets_fn = udtf(
        BM25Facets,
        returnType="facet_field string, facet_value string, n long")
    spark.udtf.register(f"{name}_facets", facets_fn)
    return fn
