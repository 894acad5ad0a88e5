"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (implementations in ``rdf_indexer_spark/queries.py``);
``oracle_sql()`` restates each SQL-expressible one in ANSI SQL for the
DuckDB side-by-side check. Spark-only operators (index internals, LSH,
simhash, RDF parse layer) have rows-only checks here and exact oracles in
``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TOKEN_RE2 = r"[\p{L}\p{N}_]+"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact BM25 relevance scoring over the documents table at
    sf0.001 (the full-text query path the whole index exists for, Q-9)."""
    from rdf_indexer_spark.queries import q_bm25_scores

    return q_bm25_scores(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rdf_indexer_spark import queries as Q

    return {
        # relational surface (reference Q-2..Q-8, J-*, G-*, D-5)
        "archive_filter": Q.q_archive_filter,
        "fq_and_or": Q.q_fq_and_or,
        "point_lookup": Q.q_point_lookup,
        "pagination": Q.q_pagination,
        "projection": Q.q_projection,
        "delete_by_query": Q.q_delete_by_query,
        "agg_summary": Q.q_agg_summary,
        "error_summary": Q.q_error_summary,
        "derived_dates": Q.q_derived_dates,
        "first_last": Q.q_first_last,
        "window_running": Q.q_window_running,
        "full_outer_compare": Q.q_full_outer_compare,
        "except_all": Q.q_except_all,
        "resolve_join": Q.q_resolve_join,
        "multi_join_topk": Q.q_multi_join_topk,
        "events_tumbling": Q.q_events_tumbling,
        "text_size_windows": Q.q_text_size_windows,
        # fulltext index surface (T-11, postings, stats, Q-9)
        "token_count": Q.q_token_count,
        "postings": Q.q_postings,
        "term_df": Q.q_term_df,
        "corpus_stats": Q.q_corpus_stats,
        "bm25_scores": Q.q_bm25_scores,
        "bm25_topk_wand": Q.q_bm25_topk_wand,
        # training-data pipeline operators
        "exact_dedup": Q.q_exact_dedup,
        "quality": Q.q_quality,
        "ann_cosine": Q.q_ann_cosine,
        # Spark-only (rows-only checks; pytest oracles in tests/)
        "minhash_neardup": Q.q_minhash_neardup,
        "simhash_neardup": Q.q_simhash_neardup,
        "langid": Q.q_langid,
        "fingerprints": Q.q_fingerprints,
        "ann_lsh": Q.q_ann_lsh,
        "rdf_documents": Q.q_rdf_documents,
        "rdf_errors": Q.q_rdf_errors,
    }


def oracle_sql() -> dict[str, str]:
    tok = f"regexp_extract_all(lower(text), '{TOKEN_RE2}')"
    bm25_terms = "('window'), ('shuffle'), ('join')"
    post_terms = "('data'), ('spark'), ('query')"
    return {
        "archive_filter": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
            FROM orders WHERE o_orderstatus = 'F'
        """,
        "fq_and_or": """
            SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
            FROM lineitem
            WHERE (l_returnflag = 'R' AND l_linestatus = 'F') OR l_quantity < 3
        """,
        "point_lookup": """
            SELECT o_orderkey, o_custkey, o_orderstatus
            FROM orders WHERE o_orderkey = 500
        """,
        "pagination": """
            SELECT o_orderkey, o_orderstatus FROM orders
            ORDER BY o_orderkey LIMIT 50 OFFSET 100
        """,
        "projection": "SELECT c_custkey, c_name, c_nationkey FROM customer",
        "delete_by_query": """
            SELECT count(*)::BIGINT AS remaining
            FROM orders WHERE NOT (o_orderstatus = 'F')
        """,
        "agg_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 1) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "error_summary": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS distinct_users,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY event_type
        """,
        "derived_dates": """
            WITH y AS (
              SELECT o_orderkey, strftime(o_orderdate, '%Y') AS year4,
                     CAST(substr(strftime(o_orderdate, '%Y'), 3, 2) AS INT) AS sub
              FROM orders
            )
            SELECT o_orderkey, year4,
                   substr(year4, 1, 3) || '0' AS decade,
                   substr(year4, 1, 2) ||
                     CASE WHEN sub >= 75 THEN '75' WHEN sub >= 50 THEN '50'
                          WHEN sub >= 25 THEN '25' ELSE '00' END AS quarter_century,
                   substr(year4, 1, 2) ||
                     CASE WHEN sub >= 50 THEN '50' ELSE '00' END AS half_century,
                   substr(year4, 1, 2) || '00' AS century
            FROM y
        """,
        "first_last": """
            WITH ranked AS (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rn_a,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
              FROM orders
            )
            SELECT o_custkey,
                   min(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_order,
                   min(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_order
            FROM ranked WHERE rn_a = 1 OR rn_d = 1
            GROUP BY o_custkey
        """,
        "window_running": """
            SELECT event_id, user_id,
                   round(max(value) OVER w, 2) AS running_max,
                   (count(*) OVER w)::BIGINT AS running_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "full_outer_compare": """
            WITH c AS (SELECT DISTINCT c_custkey AS key, 1 AS in_c FROM customer),
                 o AS (SELECT DISTINCT o_custkey AS key, 1 AS in_o FROM orders)
            SELECT coalesce(c.key, o.key) AS key,
                   CASE WHEN in_c IS NOT NULL AND in_o IS NOT NULL THEN 'matched'
                        WHEN in_c IS NOT NULL THEN 'not reindexed'
                        ELSE 'introduced' END AS status
            FROM c FULL OUTER JOIN o ON c.key = o.key
        """,
        "except_all": """
            SELECT c_custkey AS key FROM customer
            EXCEPT ALL
            SELECT o_custkey AS key FROM orders
        """,
        "resolve_join": """
            SELECT n_nationkey, n_name, r_name AS region_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "multi_join_topk": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "events_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(*)::BIGINT AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "text_size_windows": """
            WITH t AS (
              SELECT doc_id, length(text) AS tlen,
                     row_number() OVER (ORDER BY doc_id) - 1 AS rn
              FROM documents
            )
            SELECT (rn // 100)::BIGINT AS window_id,
                   sum(tlen)::BIGINT AS window_bytes,
                   max(tlen)::BIGINT AS max_doc_bytes,
                   count(*)::BIGINT AS docs
            FROM t GROUP BY 1
        """,
        "token_count": f"""
            SELECT doc_id, len({tok})::BIGINT AS n_tokens FROM documents
        """,
        "postings": f"""
            WITH t AS (SELECT doc_id, unnest({tok}) AS term FROM documents)
            SELECT term, doc_id, count(*)::BIGINT AS tf
            FROM t WHERE term IN ('data', 'spark', 'query')
            GROUP BY term, doc_id
        """,
        "term_df": f"""
            WITH t AS (
              SELECT DISTINCT doc_id, unnest({tok}) AS term FROM documents
            )
            SELECT term, count(*)::BIGINT AS df FROM t GROUP BY term
        """,
        "corpus_stats": f"""
            WITH dl AS (SELECT len({tok}) AS dl FROM documents)
            SELECT count(*)::BIGINT AS n_docs,
                   round(avg(dl), 4) AS avgdl,
                   sum(dl)::BIGINT AS total_tokens
            FROM dl
        """,
        "bm25_scores": f"""
            WITH q(term) AS (VALUES {bm25_terms}),
            tokd AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tokd GROUP BY doc_id),
            tf AS (
              SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokd
              WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
            ),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            df AS (
              SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tokd
              WHERE term IN (SELECT term FROM q) GROUP BY term
            )
            SELECT tf.doc_id,
                   round(sum(
                     ln(1 + (n - df + 0.5) / (df + 0.5)) *
                     tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
                   ), 4) AS score
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
        """,
        "bm25_topk_wand": f"""
            WITH q(term) AS (VALUES {bm25_terms}),
            tokd AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tokd GROUP BY doc_id),
            tf AS (
              SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokd
              WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
            ),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            df AS (
              SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tokd
              WHERE term IN (SELECT term FROM q) GROUP BY term
            ),
            scores AS (
              SELECT tf.doc_id,
                     sum(
                       ln(1 + (n - df + 0.5) / (df + 0.5)) *
                       tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
                     ) AS score
              FROM tf
              JOIN df USING (term)
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(score, 4) AS score FROM scores
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_md5,
                   count(*)::BIGINT AS dup_count,
                   min(doc_id) AS canonical_id
            FROM documents GROUP BY md5(text)
        """,
        "quality": f"""
            WITH t AS (
              SELECT doc_id, text, {tok} AS toks,
                     length(text) AS n_chars FROM documents
            )
            SELECT doc_id,
                   len(toks)::BIGINT AS n_tokens,
                   round((n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         / greatest(n_chars, 1), 6) AS punct_ratio,
                   round(len(list_filter(toks, x -> x IN
                     ('the','a','an','and','or','of','to','in','is','it','that',
                      'was','for','on','with','as','at','by','be','this')))
                         / greatest(len(toks), 1), 6) AS stopword_ratio,
                   round(len(list_distinct(toks))
                         / greatest(len(toks), 1), 6) AS unique_ratio
            FROM t
        """,
        "ann_cosine": """
            -- embeddings are float32 on disk; accumulate in float64 like the
            -- Spark plan (zip_with + aggregate over doubles)
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
                 q AS (SELECT emb AS qv FROM e WHERE vec_id = 0)
            SELECT vec_id,
                   round(
                     list_dot_product(emb, qv) /
                     (sqrt(list_dot_product(qv, qv)) *
                      sqrt(list_dot_product(emb, emb))),
                   5) AS cosine
            FROM e CROSS JOIN q
        """,
    }
