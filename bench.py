#!/usr/bin/env python
"""Benchmark harness: index build + BM25 query set + headline operators.

Default: one run at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` printing ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": ..., "docs_per_sec": ...}

``python bench.py --scaling`` additionally measures the same index build at
local[2]/local[8]/local[32] in FRESH processes (separate JVMs), pairing N
and 4N inside the SAME round/window (the host's shared vCPUs drift
several-fold minute to minute), and writes per-level throughput, per-stage
breakdown, both x4 pair efficiencies and same-round hardware burns to
BENCH/BASELINE.md — the sandbox evidence for the north rule's
two-cluster-size criterion. Best demonstrated rounds persist across
invocations in BENCH/scaling_best.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

WAND_QUERIES = {
    "q_rare": "needle haystack",
    "q_hot": "the data",
    "q_mixed": "window shuffle join",
    "q_single": "spark",
    "q_multi": "table query filter scan",
}


def _t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _tmin(fn, reps: int = 2):
    """Best-of-``reps`` timing: the host's shared vCPUs drift minute to
    minute (observed same-config index_build spread 17.4-21.1 s across
    rounds), so a single sample measures the host as much as the engine.
    Back-to-back min bounds the drift; the min is the engine's demonstrated
    cost in this window."""
    best, out = None, None
    for _ in range(reps):
        dt, out = _t(fn)
        best = dt if best is None or dt < best else best
    return best, out


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs
    )


def run_index_build(spark, sf_dir: str, index_dir: str, num_buckets: int = 8,
                    replicate: int = 1, profile: dict | None = None,
                    positions: bool = False):
    from pyspark.sql import functions as F

    from rdf_indexer_spark.index.build import build_index

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", F.col("text")
    )
    n_base = docs.count()
    if replicate > 1:
        # deterministic corpus amplification: same input at both parallelism
        # levels, large enough that parallel work (not fixed job overhead)
        # dominates — replica r shifts doc ids by r*n_base (stays dense).
        # Spread the single-file source first so replica generation is not
        # a one-task stage.
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = docs.repartition(64).crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"), "text"
        )
    n_docs = n_base * replicate
    # write_postings=False: benchmark the index proper (blocks+docstore+
    # stats); the uncompressed postings table is a debug/oracle artifact
    dt, _ = _t(lambda: build_index(
        spark, docs, index_dir, num_buckets=num_buckets, resume=False,
        write_postings=False, n_docs=n_docs, profile=profile,
        positions=positions,
    ))
    return dt, n_docs


def _q_minhash_sketch(spark, sf_dir):
    from rdf_indexer_spark.textops import minhash_near_duplicates

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return minhash_near_duplicates(docs, jaccard_threshold=0.5)


def _q_simhash_fast(spark, sf_dir):
    # the production hash path (JVM xxhash64); the oracle-checked entry
    # keeps md5 so its semantics restate in DuckDB (textops.with_simhash)
    from rdf_indexer_spark.textops import simhash_near_duplicates

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return simhash_near_duplicates(docs, max_hamming=8, hash_mode="xxhash64")


def run_full(sf_dir: str, cpus: int) -> dict:
    from rdf_indexer_spark import queries as Q
    from rdf_indexer_spark.index.bm25 import IndexReader
    from rdf_indexer_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name="bench",
                      shuffle_partitions=max(cpus, 8))
    # JVM + Python-worker warmup BEFORE any timed stage — the same
    # rationale as _scaling_child: a long-lived cluster executor's steady
    # state never bills worker spawn + pandas import to a query, and
    # without this the first timed stage (index_build) absorbs the whole
    # cold fleet (measured: 40 s cold rep vs 15 s warm on identical code)
    spark.range(10_000).count()
    tp_warm = spark.sparkContext.defaultParallelism * 2
    spark.range(tp_warm).repartition(tp_warm).mapInPandas(
        lambda it: it, "id long"
    ).count()
    timings: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_idx_")
    total0 = time.perf_counter()
    try:
        # min-of-2 builds: bounds host drift so round-over-round BENCH
        # diffs measure the engine, not the box (r3 spread: 17.4-21.1 s
        # for identical code/config)
        dt1, n_docs = run_index_build(spark, sf_dir, tmp)
        dt2, _ = run_index_build(spark, sf_dir, tmp)
        dt = round(min(dt1, dt2), 3)
        timings["index_build"] = dt
        docs_per_sec = round(n_docs / dt, 1)

        reader = IndexReader(spark, tmp)
        # HEADLINE: the default query path's cluster shape — executor-side
        # WAND (applyInPandas-per-bucket + driver k-way merge). This is what
        # IndexReader.search() auto-selects whenever posting volume is
        # non-trivial, so it's the number that matters at scale.
        for name, q in WAND_QUERIES.items():
            dt, _ = _tmin(lambda q=q: reader.search_wand_distributed(q, 10))
            timings[f"wand_{name}"] = round(dt, 3)
        # the small-index driver-walk fast path, for comparison
        for name in ("q_rare", "q_hot", "q_mixed"):
            q = WAND_QUERIES[name]
            dt, _ = _tmin(lambda q=q: reader.search_wand(q, 10))
            timings[f"wand_driver_{name}"] = round(dt, 3)
        # the batch QPS surface: ALL five queries in ONE distributed job —
        # compare against Σ wand_q_* to see the per-job overhead amortize
        dt, _ = _tmin(lambda: reader.search_many(WAND_QUERIES, 10).collect())
        timings["wand_batch5"] = round(dt, 3)
        dt, _ = _tmin(lambda: reader.score_exhaustive("window shuffle join", 10).collect())
        timings["bm25_exhaustive"] = round(dt, 3)

        headline = {
            "agg_summary": Q.q_agg_summary,
            "multi_join_topk": Q.q_multi_join_topk,
            "window_running": Q.q_window_running,
            "events_tumbling": Q.q_events_tumbling,
            "term_df": Q.q_term_df,
            "minhash_neardup": Q.q_minhash_neardup,
            # the r1-comparable sketch path (signature-estimate verify, no
            # exact-Jaccard re-join): the 100-TB scale variant
            "minhash_sketch": _q_minhash_sketch,
            "simhash_neardup": Q.q_simhash_neardup,
            # production sketch hashing (xxhash64) vs the md5 oracle variant
            "simhash_fast": _q_simhash_fast,
            "exact_dedup": Q.q_exact_dedup,
            "ann_cosine": Q.q_ann_cosine,
            "quality": Q.q_quality,
            # Solr serving surface (r5): facet counts over the full match
            # set, match-all browse facets, MoreLikeThis. These run through
            # the queries layer whose cached meta-ful index is built on the
            # first rep — min-of-2 records the warm-index run.
            "bm25_facets": Q.q_bm25_facets,
            "facet_browse": Q.q_facet_browse,
            "bm25_mlt": Q.q_bm25_mlt,
            "spell_suggest": Q.q_spell_suggest,
            "bm25_highlight": Q.q_bm25_highlight,
            "bm25_boolean": Q.q_bm25_boolean,
            "bm25_sort_field": Q.q_bm25_sort_field,
            "bm25_grouped": Q.q_bm25_grouped,
            "facet_range": Q.q_facet_range,
            "field_stats": Q.q_field_stats,
            # deep paging / dictionary browse / pivots / rerank (r5)
            "bm25_cursor_page2": Q.q_bm25_cursor_page2,
            "terms_component": Q.q_terms_component,
            "facet_pivot": Q.q_facet_pivot,
            "bm25_rerank": Q.q_bm25_rerank,
            "bm25_collated": Q.q_bm25_collated,
            "facet_queries": Q.q_facet_queries,
            # curation operators (r5): decontamination / PII / repetition
            "decontaminate": Q.q_decontaminate,
            "pii_scan": Q.q_pii_scan,
            "repetition": Q.q_repetition,
            "bm25_synonyms": Q.q_bm25_synonyms,
        }
        for name, fn in headline.items():
            dt, _ = _tmin(lambda fn=fn: fn(spark, sf_dir).count())
            timings[name] = round(dt, 3)

        # `value` = Σ per-stage min (the drift-bounded suite cost — each
        # stage ran twice back-to-back and reports its min); `wall_total`
        # below keeps the raw two-rep wall-clock for transparency
        total = round(sum(timings.values()), 3)
        wall_total = round(time.perf_counter() - total0, 3)

        # ANN quality: mean recall@10 vs exact top-10 over 50 queries, on a
        # deterministic CLUSTERABLE corpus (the driver's embeddings.parquet
        # is i.i.d. noise — no neighbor structure exists there for ANY
        # sublinear method to exploit, so recall on it measures nothing).
        # LSH runs at the module's real operating point (n_tables=4,
        # n_bits=12, multiprobe); IVF reports recall + probed corpus
        # fraction at nprobe ∈ {1, 4, 8} over one shared index. QUALITY
        # measurements: timed, but outside the wallclock total so `value`
        # stays comparable across rounds.
        from pyspark.sql import functions as F

        from rdf_indexer_spark.similarity import (
            cosine_topk_batch, ivf_index, ivf_recall_at_k, kmeans_centroids,
            lsh_recall_at_k, synthetic_clustered_embeddings,
        )

        emb = synthetic_clustered_embeddings(spark, n=4000, dim=64).persist()
        emb.count()
        # ONE brute-force oracle pass, timed separately and shared by every
        # recall call below (VERDICT r4 item 5: the recall jobs were
        # oracle-dominated — the r4 IVF loop re-ran the oracle per nprobe —
        # so index-path cost was invisible; now each side carries its own
        # number and ann_*_recall_job times the INDEX PATH only)
        q_rows = emb.filter(F.col("vec_id") < 50).select(
            "vec_id", "embedding").collect()
        queries_df = spark.createDataFrame(
            [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in q_rows],
            "query_id int, qvec array<double>",
        )
        oracle = cosine_topk_batch(emb, queries_df, 10).persist()
        dt, _ = _t(oracle.count)
        timings["ann_oracle_job"] = round(dt, 3)

        dt, recall = _t(lambda: lsh_recall_at_k(
            emb, n_queries=50, k=10, n_tables=4, n_bits=12, oracle=oracle))
        timings["ann_lsh_recall_job"] = round(dt, 3)
        ann_recall = round(recall, 4)

        cents = kmeans_centroids(emb, dim=64, n_centroids=32, sample=2000)
        ivf_idx = ivf_index(emb, cents).persist()
        ann_ivf = {}
        t_ivf = 0.0
        for nprobe in (1, 4, 8):
            dt, r = _t(lambda nprobe=nprobe: ivf_recall_at_k(
                emb, n_queries=50, k=10, nprobe=nprobe,
                centroids=cents, index_df=ivf_idx, oracle=oracle))
            t_ivf += dt
            ann_ivf[f"nprobe_{nprobe}"] = r
        timings["ann_ivf_recall_job"] = round(t_ivf, 3)
        oracle.unpersist()

        # Lucene clause extensions (r5): dictionary-expansion queries
        # (wildcard/fuzzy → grouped walk), minimum-should-match. Timed
        # AFTER `value` is summed like the ANN jobs, so the headline
        # metric stays comparable across rounds.
        dt, _ = _tmin(lambda: reader.search_lucene(Q.WILDCARD_QUERY, 10))
        timings["lucene_wildcard"] = round(dt, 3)
        dt, _ = _tmin(lambda: reader.search_lucene(Q.FUZZY_QUERY, 10))
        timings["lucene_fuzzy"] = round(dt, 3)
        dt, _ = _tmin(lambda: reader.search_boolean(
            [], ["window", "shuffle", "join"], [], k=10,
            min_should_match=2))
        timings["bm25_mm2"] = round(dt, 3)

        # positional index (r5, phrase queries): build cost + on-disk size
        # delta of positions=True vs the core bag-of-words index, and
        # phrase top-k latency. Like the ANN quality jobs these run AFTER
        # `value` is summed, so the headline metric stays comparable with
        # r4 while BENCH carries the positional numbers the VERDICT asked
        # for (item 4: "index-size delta reported in BENCH").
        pos_tmp = tempfile.mkdtemp(prefix="bench_pidx_")
        try:
            dt_p, _ = run_index_build(spark, sf_dir, pos_tmp, positions=True)
            timings["index_build_positional"] = round(dt_p, 3)
            preader = IndexReader(spark, pos_tmp)
            dt, _ = _tmin(
                lambda: preader.search_phrase("table hash", 10))
            timings["phrase_topk"] = round(dt, 3)
            dt, _ = _tmin(
                lambda: preader.search_phrase("window shuffle join", 10))
            timings["phrase_topk_3term"] = round(dt, 3)
            # sloppy + mixed phrase/boolean scorer tree (r5)
            dt, _ = _tmin(
                lambda: preader.search_phrase("table hash", 10, slop=2))
            timings["phrase_topk_slop2"] = round(dt, 3)
            dt, _ = _tmin(
                lambda: preader.search_lucene(Q.MIXED_QUERY, 10))
            timings["lucene_mixed"] = round(dt, 3)
            core_b = _dir_bytes(os.path.join(tmp, "blocks"))
            pos_b = _dir_bytes(os.path.join(pos_tmp, "blocks"))
            index_size = {
                "blocks_bytes_core": core_b,
                "blocks_bytes_positional": pos_b,
                "positional_overhead_x": (
                    round(pos_b / core_b, 3) if core_b else None),
            }
        finally:
            shutil.rmtree(pos_tmp, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        # r4 changed `value` from single-rep wall-clock to Σ per-stage
        # min-of-2; the metric NAME changes with it so cross-round
        # comparisons never mix the two definitions (pre-r4 history keeps
        # "index_build+query_suite_wallclock"; `wall_total` remains the raw
        # two-rep wall-clock)
        "metric": "suite_stage_min_sum",
        "value": total,
        "unit": "sec",
        "timing": "per-stage min of 2 back-to-back runs (drift-bounded)",
        "wall_total": wall_total,
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "ann_lsh_recall_at_10": ann_recall,
        "ann_ivf_recall_at_10": ann_ivf,
        "index_size": index_size,
    }


# 192 × 5000 docs ≈ 1M docs / ~270 MB text per level: big enough that the
# parallel stages dominate fixed job overhead at every parallelism level
# (at 96× the fixed share at 8 cores was ~25% of wall — Amdahl-capped the
# measurable efficiency well below the engine's own scaling)
SCALING_REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "192"))


def _scaling_child(sf_dir: str, cpus: int) -> dict:
    """Runs in a fresh process (cold JVM). Measures the full index build
    PLUS isolated per-stage jobs so the parent can report which stages
    scale: tokenize (narrow, CPU-dominant regex), postings (adds the
    explode + groupBy shuffle), full build (adds pack + write)."""
    from pyspark.sql import functions as F

    from rdf_indexer_spark.analyzer import tokenize_col
    from rdf_indexer_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name=f"bench-scaling-{cpus}")
    spark.range(10_000).count()  # JVM warmup outside the timed section
    # Python-worker warmup: spawn + pandas-import every Arrow worker BEFORE
    # the timed sections (a long-lived cluster executor's steady state;
    # otherwise the worker fleet's cold import is billed to whichever stage
    # first touches Python, ~linearly in worker count)
    tp_warm = spark.sparkContext.defaultParallelism * 2
    spark.range(tp_warm).repartition(tp_warm).mapInPandas(
        lambda it: it, "id long"
    ).count()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_base = docs.count()
    reps = spark.range(SCALING_REPLICATE).select(F.col("id").alias("rep"))
    docs = docs.repartition(64).crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"), "text"
    )
    toks = tokenize_col(F.col("text"))

    stages: dict[str, float] = {}
    volumes: dict[str, int] = {}
    # text bytes scanned (also warms the OS page cache identically per level)
    dt, row = _t(lambda: docs.select(
        F.sum(F.length("text")).alias("b"), F.count("*").alias("n")).collect())
    volumes["text_bytes"] = int(row[0]["b"])
    volumes["docs"] = int(row[0]["n"])
    # stage 1 — NARROW tokenize: regex + array alloc, no shuffle (CPU-bound)
    dt, _ = _t(lambda: docs.select(F.sum(F.size(toks))).collect())
    stages["tokenize"] = dt
    # stage 2 — tokenize + explode + groupBy(term, doc) partial-agg shuffle
    dt, row = _t(lambda: docs.select(F.explode(toks).alias("term"), "doc_id")
                 .groupBy("term", "doc_id").count()
                 .agg(F.count("*").alias("n")).collect())
    stages["postings_shuffle"] = dt
    volumes["postings"] = int(row[0]["n"])
    # stage 3 — the full build (adds aligned repartition, block pack, writes)
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix=f"bench_scale_{cpus}_", dir=tmp_root)
    try:
        dt, n_docs = run_index_build(
            spark, sf_dir, tmp, num_buckets=32, replicate=SCALING_REPLICATE
        )
        stages["full_build"] = dt
        volumes["index_bytes"] = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(tmp) for f in fs
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"cpus": cpus, "seconds": stages["full_build"], "docs": n_docs,
            "docs_per_sec": n_docs / stages["full_build"],
            "stages": stages, "volumes": volumes}


def _attr_child(sf_dir: str, cpus: int) -> dict:
    """Substage attribution child (VERDICT r4 item 2): the exact scaling
    workload of ``_scaling_child`` (same replicate, buckets, /dev/shm sink),
    but the build runs in profile mode, so the post-shuffle residual that
    scaled only 1.54x (vs the shuffle's 2.81x) decomposes into lineage
    compute (noop-sink executions of the same DataFrames), sink writes
    (write_pass - noop ~= sink cost), metric re-scans and finalize."""
    from rdf_indexer_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name=f"bench-attr-{cpus}")
    spark.range(10_000).count()  # JVM warmup
    tp_warm = spark.sparkContext.defaultParallelism * 2
    spark.range(tp_warm).repartition(tp_warm).mapInPandas(
        lambda it: it, "id long"
    ).count()  # Python-worker fleet warmup (see _scaling_child)

    profile: dict[str, float] = {}
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix=f"bench_attr_{cpus}_", dir=tmp_root)
    try:
        dt, n_docs = run_index_build(
            spark, sf_dir, tmp, num_buckets=32,
            replicate=SCALING_REPLICATE, profile=profile,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"cpus": cpus, "seconds": dt, "docs": n_docs,
            "profile": {k: round(v, 3) for k, v in profile.items()}}


def _memburn(n):
    """Memory-streaming burn (~160 MB working set): measures DRAM-bandwidth
    scaling, the binding resource for a data engine, unlike the
    cache-resident arithmetic burn."""
    import numpy as np

    a = np.arange(n, dtype=np.int64)
    s = 0
    for _ in range(3):
        s += int((a * 3 + 1).sum())
    return s


def _burn_speedup(n_workers_a: int, n_workers_b: int) -> dict:
    """Hardware capacity ratios between two worker counts, measured NOW
    (the host's shared vCPUs fluctuate heavily over time): cpu-bound and
    memory-bandwidth-bound."""
    import multiprocessing as mp

    out = {}
    for name, fn, arg in (("cpu", _burn, 2_000_000), ("mem", _memburn, 20_000_000)):
        times = {}
        for w in (n_workers_a, n_workers_b):
            best = None
            for _ in range(3):  # best-of-3: the host drifts minute to minute
                t0 = time.perf_counter()
                with mp.Pool(w) as p:
                    p.map(fn, [arg] * 16)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[w] = best
        out[name] = times[n_workers_a] / times[n_workers_b]
    return out


def run_scaling(sf_dir: str, levels=None, rounds: int | None = None) -> dict:
    """N vs 4N parallelism measurement with SAME-WINDOW pairing.

    The host's shared vCPUs drift minute-to-minute (same-work burns vary
    several-fold), so cross-window ratios are meaningless. Each round runs
    every level back-to-back (one window) and computes the pair ratios
    WITHIN the round; the reported number per pair is the MEDIAN round's
    ratio (the representative window), with the best round and every round
    listed for transparency and the round's own CPU/memory burns as the
    hardware ceiling. Levels (2, 8, 32) give the 2→8 and 8→32 ×4 pairs."""
    if levels is None:
        levels = tuple(int(x) for x in os.environ.get(
            "SPARK_GRAFT_SCALE_LEVELS", "2,8,32").split(","))
    if rounds is None:
        rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    # Optional idle gap before each child: the host throttles SUSTAINED
    # multi-core load (burst credits) — back-to-back children leave the
    # later, wider child running against a drained credit state, which
    # anti-correlates the pair (observed: 2-core faster AND 8-core slower
    # in the same round). A cooldown lets every level start from the same
    # credit state, which is what per-level capacity comparison assumes.
    cooldown = int(os.environ.get("SPARK_GRAFT_CHILD_COOLDOWN", "0"))
    all_rounds: list[dict] = []
    for rnd in range(rounds):
        window: dict[int, dict] = {}
        for cpus in levels:
            if cooldown:
                time.sleep(cooldown)
            env = dict(os.environ)
            repo = os.path.dirname(os.path.abspath(__file__))
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(cpus), sf_dir],
                capture_output=True, text=True, check=True, env=env,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            window[cpus] = json.loads(line)
        burns = {
            (lo, hi): _burn_speedup(lo, hi)
            for lo, hi in zip(levels, levels[1:])
        }
        all_rounds.append({"levels": window, "burns": burns})
        # stop early only when the MEDIAN of the top pair's rounds so far
        # already meets the target (median is the reported headline, so
        # stopping on a single lucky round would bias it)
        top = (levels[-2], levels[-1])
        sps = sorted(
            rd["levels"][top[1]]["docs_per_sec"]
            / rd["levels"][top[0]]["docs_per_sec"]
            for rd in all_rounds
        )
        med_sp = sps[(len(sps) - 1) // 2]
        if rnd >= 2 and med_sp / (top[1] / top[0]) >= 0.8:
            break

    def _round_rows(lo: int, hi: int) -> list[dict]:
        rows = []
        for rd in all_rounds:
            r_n, r_4n = rd["levels"][lo], rd["levels"][hi]
            speedup = r_4n["docs_per_sec"] / r_n["docs_per_sec"]
            rows.append({
                "docs": r_n.get("docs"),
                "speedup": speedup,
                "efficiency": speedup / (hi / lo),
                "stage_efficiency": {
                    st: (r_n["stages"][st] / r_4n["stages"][st]) / (hi / lo)
                    for st in r_n.get("stages", {})
                    if st in r_4n.get("stages", {})
                },
                "hw_cpu_speedup": rd["burns"][(lo, hi)]["cpu"],
                "hw_mem_speedup": rd["burns"][(lo, hi)]["mem"],
                "n_wall": r_n["seconds"], "four_n_wall": r_4n["seconds"],
            })
        return rows

    def _pair(lo: int, hi: int, rows: list[dict]) -> dict:
        # HEADLINE = the MEDIAN round (by speedup): the representative
        # window on a drifting shared box. The best round is reported
        # alongside as the box's demonstrated capability.
        by_speedup = sorted(rows, key=lambda r: r["speedup"])
        median = by_speedup[(len(by_speedup) - 1) // 2]
        best = by_speedup[-1]
        return {
            "n": lo, "four_n": hi, **median,
            "best_speedup": best["speedup"],
            "best_efficiency": best["efficiency"],
            "best_stage_efficiency": best["stage_efficiency"],
            "best_hw_cpu_speedup": best["hw_cpu_speedup"],
            "best_hw_mem_speedup": best["hw_mem_speedup"],
            "hw_normalized_efficiency": (
                median["speedup"] / median["hw_mem_speedup"]
                if median["hw_mem_speedup"] else None),
            "all_rounds": rows,
        }

    # merge with previous invocations OF THE SAME ENGINE REVISION — the
    # median must represent the current code, so a rev change invalidates
    # accumulated rounds (the old numbers stay in git history)
    rev = _engine_rev()
    hist_path = os.path.join("BENCH", "scaling_best.json")
    try:
        with open(hist_path) as f:
            raw = json.load(f)
        hist_rounds = (
            {tuple(k.split(":")): v for k, v in raw["rounds"].items()}
            if isinstance(raw, dict) and raw.get("rev") == rev else {}
        )
    except (OSError, ValueError):
        hist_rounds = {}

    pairs = []
    store: dict[str, list] = {
        # pairs from earlier invocations at levels not re-measured this run
        # stay on record (same rev)
        ":".join(k): v for k, v in hist_rounds.items()
    }
    for i in range(len(levels) - 1):
        lo, hi = levels[i], levels[i + 1]
        rows = hist_rounds.get((str(lo), str(hi)), []) + _round_rows(lo, hi)
        store[f"{lo}:{hi}"] = rows
        pairs.append(_pair(lo, hi, rows))
    os.makedirs("BENCH", exist_ok=True)
    with open(hist_path, "w") as f:
        json.dump({"rev": rev, "rounds": store}, f)
    primary = pairs[-1]
    # representative per-level rows from the primary pair's median round
    ratios = sorted(
        range(len(all_rounds)), key=lambda i: (
            all_rounds[i]["levels"][levels[-1]]["docs_per_sec"]
            / all_rounds[i]["levels"][levels[-2]]["docs_per_sec"]))
    med_idx = ratios[(len(ratios) - 1) // 2]
    return {
        "levels": [all_rounds[med_idx]["levels"][c] for c in levels],
        "pairs": pairs,
        "speedup": primary["speedup"],
        "efficiency": primary["efficiency"],
        "best_speedup": primary["best_speedup"],
        "best_efficiency": primary["best_efficiency"],
        "hw_cpu_speedup": primary["hw_cpu_speedup"],
        "hw_mem_speedup": primary["hw_mem_speedup"],
        "hw_normalized_efficiency": primary["hw_normalized_efficiency"],
    }


def _engine_rev() -> str:
    # override for accumulating rounds across commits that don't touch the
    # measured build path (docs-only / query-side changes)
    env = os.environ.get("SPARK_GRAFT_ENGINE_REV")
    if env:
        return env
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=repo,
        )
        rev = out.stdout.strip() or "unknown"
        # a dirty tree is a DIFFERENT engine than the committed rev: rounds
        # measured from it must never merge with committed-rev history (the
        # accumulated median must represent exactly one code state)
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=repo,
        ).stdout.strip()
        return rev + ("-dirty" if dirty else "")
    except OSError:
        return "unknown"


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def hardware_calibration() -> list[tuple[int, float]]:
    """Pure-CPU multiprocessing burn at 1..32 workers — measures how much
    real parallel capacity the host's vCPUs deliver, independent of Spark."""
    import multiprocessing as mp

    out = []
    for w in (1, 2, 4, 8, 16, 32):
        t0 = time.perf_counter()
        with mp.Pool(w) as p:
            p.map(_burn, [2_000_000] * 32)
        out.append((w, time.perf_counter() - t0))
    return out


def _fmt2(v) -> str:
    return "n/a" if v is None else f"{v:.2f}"


def write_baseline_md(scaling: dict, bench: dict, calib=None) -> None:
    os.makedirs("BENCH", exist_ok=True)
    calib_rows = ""
    if calib:
        t1 = calib[0][1]
        rows = "\n".join(
            f"| {w} | {dt:.2f} | {t1/dt:.2f}× |" for w, dt in calib
        )
        calib_rows = f"""
## Hardware calibration (engine-independent)

Pure-CPU multiprocessing burn, same total work, 1..32 workers — how much
real parallel capacity the host's 32 vCPUs deliver:

| workers | wall (s) | speedup vs 1 |
|---|---|---|
{rows}

On a real 4N-executor cluster the added parallelism is real cores (and
memory channels) on separate hosts; the burns quantify how much of the
advertised 4× this single box actually offers in each window.
"""
    level_rows = "\n".join(
        f"| local[{r['cpus']}] | {r['seconds']:.2f} | {r['docs']} | "
        f"{r['docs_per_sec']:.1f} | {r['docs_per_sec']/r['cpus']:.1f} |"
        for r in scaling["levels"]
    )
    stage_names = list(scaling["levels"][0].get("stages", {}))
    stage_rows = "\n".join(
        "| " + s + " | " + " | ".join(
            f"{r['stages'][s]:.2f}" for r in scaling["levels"]
        ) + " |"
        for s in stage_names
    )
    pair_sections = []
    for p in scaling["pairs"]:
        se = "; ".join(f"{k} {v:.2f}" for k, v in p["stage_efficiency"].items())
        rounds_tbl = "\n".join(
            f"| {i+1} | {r.get('docs') or '?'} | {r['n_wall']:.1f} "
            f"| {r['four_n_wall']:.1f} | {r['speedup']:.2f}× "
            f"| {r['efficiency']:.2f} | {r['hw_cpu_speedup']:.2f}× "
            f"| {r['hw_mem_speedup']:.2f}× |"
            for i, r in enumerate(p.get("all_rounds", []))
        )
        pair_sections.append(f"""### {p['n']} → {p['four_n']} cores (×{p['four_n']//p['n']})

- engine speedup (MEDIAN same-window round — the headline): **{p['speedup']:.2f}×** → raw efficiency **{p['efficiency']:.2f}**
- per-stage raw efficiency in the median round: {se}
- hardware capacity measured in the median round: CPU burn
  {p['hw_cpu_speedup']:.2f}×, memory-streaming burn {p['hw_mem_speedup']:.2f}×
- engine speedup ÷ memory-bandwidth speedup (median round): {_fmt2(p['hw_normalized_efficiency'])}
- best round for context: {p.get('best_speedup', p['speedup']):.2f}× (raw eff {p.get('best_efficiency', p['efficiency']):.2f}), same-round hw CPU burn {p.get('best_hw_cpu_speedup', p['hw_cpu_speedup']):.2f}×

All rounds (same-window N / 4N wall s, ratio, raw eff, hw burns; docs =
replicated corpus size for that round):

| round | docs | N wall | 4N wall | speedup | raw eff | hw cpu | hw mem |
|---|---|---|---|---|---|---|---|
{rounds_tbl}
""")
    capacity_lines = "\n".join(
        f"- {p['n']}→{p['four_n']}: median engine speedup "
        f"**{p['speedup']:.2f}×** against a same-round hardware CPU-burn "
        f"capacity of {p['hw_cpu_speedup']:.2f}× (of a theoretical "
        f"{p['four_n']//p['n']}×) — the engine converted "
        f"**{p['speedup']/p['hw_cpu_speedup']:.2f}** of the parallel "
        f"capacity the box demonstrably offered in that window"
        for p in scaling["pairs"]
    )
    vols = scaling["levels"][0].get("volumes", {})
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

Sandbox evidence for the north rule's two-cluster-size scaling criterion:
the same index-build job, same input ({bench['sf']} documents replicated
×{SCALING_REPLICATE} deterministically so parallel work dominates fixed job
overhead), at parallelism levels {[r['cpus'] for r in scaling['levels']]} in
fresh JVMs. The host's shared vCPUs drift several-fold minute to minute,
so each ROUND runs every level back-to-back in one window and ratios are
computed within the round; the headline per pair is the MEDIAN round
(best shown for context) and every round is listed below. RAW
efficiencies are the primary numbers; CPU/memory burns from the same round
give the hardware's actual capacity for context.

Measurement protocol this round: every child starts after an idle
COOLDOWN of {os.environ.get('SPARK_GRAFT_CHILD_COOLDOWN', '0')} s
(``SPARK_GRAFT_CHILD_COOLDOWN``) so each parallelism level begins from
the same host burst-credit state — r3 diagnosed bimodal rounds (clean
≈2.2-2.5× vs throttled ≈1.3-1.6× on the same code) caused by the later,
wider child running against credits the earlier child drained. Engine
build-path changes measured in r3 (persist removal, Observation→pruned
re-scan, stats folded into manifest sums) are kept; r4 adds only
query-side work, so the build being measured here is the r3 engine.

Per-stage data volumes (identical at every level): text scanned
{vols.get('text_bytes', 0):,} bytes across {vols.get('docs', 0):,} docs,
{vols.get('postings', 0):,} postings, index written
{vols.get('index_bytes', 0):,} bytes — the tokenize stage streams
~{vols.get('text_bytes', 0) >> 20} MB of text per pass and the shuffle
materializes every posting, which is why DRAM bandwidth (not instruction
throughput) is the binding resource for stages 2-3.

## Engine scaling

| parallelism | wall (s) | docs | docs/sec | docs/sec/core |
|---|---|---|---|---|
{level_rows}

Per-stage wall seconds (tokenize = narrow CPU-bound regex; postings_shuffle
= tokenize + explode + groupBy shuffle; full_build = everything + pack +
write):

| stage | {' | '.join(f"local[{r['cpus']}]" for r in scaling['levels'])} |
|---|{'---|' * len(scaling['levels'])}
{stage_rows}

{chr(10).join(pair_sections)}
### Reading

The north-rule target is ≥0.8 per-core efficiency N→4N; raw numbers above
are the primary evidence. Context for pairs that miss it:

{capacity_lines}

The burns are engine-independent measurements of how much parallel
capacity the box itself delivered in each round (shared/SMT vCPUs, one
memory controller, multi-tenant throttling) — on a real cluster each 4N
step adds separate hosts with their own memory channels, the regime the
engine's one-shuffle, part-aligned-write design targets.

Full suite timings (local[{bench['cpus']}], {bench['sf']}):

```json
{json.dumps(bench, indent=2)}
```
""")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        cpus, sf_dir = int(sys.argv[2]), sys.argv[3]
        print(json.dumps(_scaling_child(sf_dir, cpus)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--attr-child":
        cpus, sf_dir = int(sys.argv[2]), sys.argv[3]
        print(json.dumps(_attr_child(sf_dir, cpus)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        bench = run_full(SF_DIR, CPUS)
        calib = hardware_calibration()
        scaling = run_scaling(SF_DIR)
        write_baseline_md(scaling, bench, calib)
        bench["scaling_efficiency"] = round(scaling["efficiency"], 3)
        print(json.dumps(bench))
        return
    print(json.dumps(run_full(SF_DIR, CPUS)))


if __name__ == "__main__":
    main()
