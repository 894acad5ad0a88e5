"""Inverted-index build: documents → docstore + postings + packed blocks.

This internalizes what the reference ships to Solr over HTTP
(``SolrClient.java:210-236``): the index itself. Spark-first shape
(SURVEY.md §3.1):

  stage 1 (narrow): tokenize (JVM-native regexp, T-11) → dl, sha256
  stage 2 (shuffle): ``groupBy(term, doc_id)`` → tf (map-side partial agg),
           then ONE part-aligned repartition + in-partition sort by
           (part, term, doc_id)
  stage 3 (NARROW): streaming ``mapInPandas`` block packer over the sorted
           stripe-exclusive partitions → delta+varbyte blocks with block-max
           metadata, term-sorted files (no second shuffle)

**Partitioning / skew / scale.** Doc ids are dense and range-bucketed into
``num_buckets`` partitions (``part=K`` hive dirs). All three stages run as
ONE job each over every *pending* bucket (dynamic partition overwrite), so
fixed job overhead is O(stages), not O(buckets). Checkpoint granularity is
``buckets_per_job``: after each job group, every bucket in it commits a
manifest row (lineage: rows / tokens / postings / content-sha aggregate).
Resume filters finished buckets out of the next group — an interrupted run
recomputes only the unfinished group, never committed buckets.

Hot Zipf terms never serialize: block packing groups by (bucket, term), so a
hot term's postings pack in ≤ num_buckets independent tasks (range salting
by construction — SURVEY.md §4.3.1); per-bucket doc ranges are disjoint and
sorted, so bucket block lists concatenate into globally sorted posting lists
and the query-side merge is free.

On a real cluster the parquet writes become Iceberg appends (snapshot id in
the manifest) and buckets are sized to executor memory (e.g. 4096 over 10^12
docs, ~100 buckets per job group → checkpoint every few minutes of work).

Blocks store ``(max_tf, dl_min)`` so query time can compute the block-max
BM25 bound for any (k1, b, avgdl): the score is increasing in tf and
decreasing in dl, hence ``idf · max_tf/(max_tf + K(dl_min))`` dominates every
member posting.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import tokenize_col
from .codec import BLOCK_SIZE, delta_encode_segmented, varbyte_parts
from .manifest import Manifest
from .writer import IndexWriter

BLOCK_SCHEMA = (
    "part int, term string, seq int, n int, first_doc_id long, "
    "last_doc_id long, max_tf int, dl_min int, tf_sum long, bin_bytes long, "
    "ids_bin binary, tfs_bin binary, dls_bin binary, pos_bin binary"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docstore(self) -> str:
        return os.path.join(self.root, "docstore")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def blocks(self) -> str:
        return os.path.join(self.root, "blocks")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats")

    @property
    def termstats(self) -> str:
        return os.path.join(self.root, "termstats")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")


def _emit_postings(positions: bool):
    """mapInPandas kernel: (part, doc_id, dl, toks) rows → FINISHED posting
    rows (part, term, doc_id, dl, tf[, positions]) — the r6 replacement for
    ``explode → groupBy(part, term, doc_id).agg(...)``.

    Because a posting aggregates tokens of ONE document, the whole
    aggregation is row-local: batch-vectorized numpy (factorize the batch
    vocabulary once, lexsort (doc, term-code, position), group boundaries
    by diff) produces exactly the rows the groupBy produced — verified
    row-identical — while REMOVING the aggregation exchange from the plan:
    the only remaining shuffle in the build is the part-aligned repartition
    (guide §2.4). The positional variant gets its sorted position lists for
    free from the lexsort (the old plan paid a collect_list + sort_array
    aggregate buffer per posting)."""

    def emit(batches):
        for pdf in batches:
            toks_l = pdf["toks"].values
            n_per = np.fromiter((len(t) for t in toks_l), np.int64,
                                count=len(toks_l))
            total = int(n_per.sum())
            if total == 0:
                continue
            flat = [w for t in toks_l for w in t]
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            doc_idx = np.repeat(np.arange(len(toks_l)), n_per)
            offs = np.concatenate(([0], np.cumsum(n_per)))
            pos = np.arange(total, dtype=np.int64) - offs[doc_idx]
            order = np.lexsort((pos, codes, doc_idx))
            d_s, c_s, p_s = doc_idx[order], codes[order], pos[order]
            if len(d_s) > 1:
                bound = np.flatnonzero(
                    (np.diff(d_s) != 0) | (np.diff(c_s) != 0)) + 1
            else:
                bound = np.array([], dtype=np.int64)
            starts = np.concatenate(([0], bound))
            ends = np.concatenate((bound, [len(d_s)]))
            g_doc = d_s[starts]
            out = {
                "part": pdf["part"].values[g_doc],
                "term": uniq[c_s[starts]],
                "doc_id": pdf["doc_id"].values[g_doc],
                "dl": pdf["dl"].values[g_doc],
                "tf": (ends - starts).astype(np.int64),
            }
            if positions:
                out["positions"] = [
                    p.astype(np.int32).tolist() for p in np.split(p_s, bound)
                ]
            yield pd.DataFrame(out)

    return emit


POSTINGS_SCHEMA = "part int, term string, doc_id long, dl int, tf long"
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA + ", positions array<int>"


def _pack_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pack one (part, term, doc_id)-sorted batch whose (part, term) groups
    are complete — vectorized across ALL groups and blocks at once.

    Group boundaries → per-group block tilings (repeat/cumsum arithmetic),
    block metadata via ``ufunc.reduceat`` at block starts (blocks tile the
    whole batch, so the starts array IS the reduceat segmentation), and ONE
    whole-batch varbyte encoding per column sliced at per-block byte
    offsets (``codec.varbyte_parts``). Per-block Python is just the three
    byte-range slices; measured ~20× over per-group packing (bit-identical
    output, asserted in tests/test_codec.py)."""
    parts = pdf["part"].values
    terms = pdf["term"].values
    ids = pdf["doc_id"].values.astype(np.int64)
    tfs = pdf["tf"].values.astype(np.int64)
    dls = pdf["dl"].values.astype(np.int64)
    has_pos = "positions" in pdf.columns
    m = len(ids)
    change = np.flatnonzero((parts[1:] != parts[:-1]) | (terms[1:] != terms[:-1])) + 1
    gs = np.concatenate(([0], change))
    gl = np.diff(np.concatenate((gs, [m])))
    nb = -(-gl // BLOCK_SIZE)  # blocks per group (ceil)
    g_of_b = np.repeat(np.arange(len(gs)), nb)
    seq = (np.arange(nb.sum()) - np.repeat(np.cumsum(nb) - nb, nb)).astype(np.int64)
    bs = gs[g_of_b] + seq * BLOCK_SIZE
    be = np.minimum(bs + BLOCK_SIZE, (gs + gl)[g_of_b])
    # per-block delta encoding == whole-array diff with a reset (raw id) at
    # every block start
    deltas = ids.copy()
    if m > 1:
        deltas[1:] = ids[1:] - ids[:-1]
    deltas[bs] = ids[bs]
    id_buf, id_off = varbyte_parts(deltas.astype(np.uint64))
    tf_buf, tf_off = varbyte_parts(tfs.astype(np.uint64))
    dl_buf, dl_off = varbyte_parts(dls.astype(np.uint64))
    if has_pos:
        # positional payload (optional, build_index(positions=True)): per
        # posting, its sorted token positions delta-encoded with a reset at
        # every posting start; per-posting counts are NOT stored — they are
        # the tf column (one position per occurrence), so the decoder
        # recovers segment boundaries for free (codec.unpack_positions)
        pos_lists = [np.asarray(p, dtype=np.int64)
                     for p in pdf["positions"].values]
        lens = np.fromiter((len(p) for p in pos_lists), np.int64, count=m)
        if not np.array_equal(lens, tfs):
            raise ValueError("positions length != tf for some posting")
        cum_pos = np.concatenate(([0], np.cumsum(lens)))
        flat = (np.concatenate(pos_lists) if m
                else np.array([], dtype=np.int64))
        pos_deltas = delta_encode_segmented(flat, cum_pos[:-1])
        pos_buf, pos_off = varbyte_parts(pos_deltas.astype(np.uint64))
        pos_col = [
            pos_buf[pos_off[cum_pos[s]]:pos_off[cum_pos[e]]].tobytes()
            for s, e in zip(bs, be)
        ]
    else:
        pos_col = [None] * len(bs)
    return pd.DataFrame({
        "part": parts[bs].astype(np.int32),
        "term": terms[bs],
        "seq": seq.astype(np.int32),
        "n": (be - bs).astype(np.int32),
        "first_doc_id": ids[bs],
        "last_doc_id": ids[be - 1],
        "max_tf": np.maximum.reduceat(tfs, bs).astype(np.int32),
        "dl_min": np.minimum.reduceat(dls, bs).astype(np.int32),
        "tf_sum": np.add.reduceat(tfs, bs),
        # packed payload size of the block (all three varbyte columns):
        # query-time fetch-cost estimation reads THIS metadata column, never
        # the binaries (termstats aggregates it per term at finalize)
        "bin_bytes": (
            (id_off[be] - id_off[bs])
            + (tf_off[be] - tf_off[bs])
            + (dl_off[be] - dl_off[bs])
        ).astype(np.int64),
        "ids_bin": [id_buf[id_off[s]:id_off[e]].tobytes() for s, e in zip(bs, be)],
        "tfs_bin": [tf_buf[tf_off[s]:tf_off[e]].tobytes() for s, e in zip(bs, be)],
        "dls_bin": [dl_buf[dl_off[s]:dl_off[e]].tobytes() for s, e in zip(bs, be)],
        "pos_bin": pos_col,
    })


def _pack_stream(batches):
    """mapInPandas kernel over part-aligned, (part, term, doc_id)-sorted
    posting partitions: a NARROW block packer.

    Because every (part, term) group is contiguous within the partition,
    packing needs no groupBy shuffle — only a carry buffer for the group
    that straddles the Arrow batch boundary; each complete-group region
    packs in one vectorized pass (:func:`_pack_batch`)."""
    carry: pd.DataFrame | None = None

    def emit(pdf: pd.DataFrame, flush: bool):
        nonlocal carry
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if len(pdf) == 0:
            return
        if not flush:
            # hold back the final (possibly incomplete) group
            parts = pdf["part"].values
            terms = pdf["term"].values
            change = np.flatnonzero(
                (parts[1:] != parts[:-1]) | (terms[1:] != terms[:-1])) + 1
            last_start = int(change[-1]) if len(change) else 0
            carry = pdf.iloc[last_start:]
            pdf = pdf.iloc[:last_start]
            if len(pdf) == 0:
                return
        yield _pack_batch(pdf.reset_index(drop=True))

    for pdf in batches:
        yield from emit(pdf, flush=False)
    if carry is not None and len(carry):
        final, carry = carry, None
        yield from emit(final, flush=True)


def _write_parts(df: DataFrame, path: str, writer: IndexWriter | None = None) -> None:
    """Dynamic partition overwrite by ``part`` — reruns replace only the
    buckets present in ``df``, never committed ones. All index mutations
    route through the :class:`.writer.IndexWriter` seam (Iceberg mapping
    documented there); this wrapper exists for callers without a writer."""
    (writer or IndexWriter()).append_partitioned(df, path)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
    meta_cols: tuple[str, ...] = (),
    resume: bool = True,
    buckets_per_job: int | None = None,
    write_postings: bool = True,
    n_docs: int | None = None,
    positions: bool = False,
    profile: dict | None = None,
) -> dict:
    """Build (or resume) the full index for ``docs`` under ``index_dir``.

    ``docs`` must carry a dense ``id_col`` (use ``docids.assign_doc_ids``
    otherwise). Returns the manifest summary dict.

    ``write_postings=False`` skips persisting the uncompressed postings
    table — a debug/oracle artifact, not part of the index proper (the
    blocks ARE the postings; Lucene keeps no uncompressed copy either).
    The core pipeline then runs as one fused lineage with no intermediate
    I/O. Pass ``n_docs`` when known to skip the max-id scan.

    ``positions=True`` builds a POSITIONAL index (Lucene stores positions
    by default — this is the substrate for phrase queries, bm25.py
    ``search_phrase``): the postings aggregation keeps each occurrence's
    token position (``posexplode`` + sorted ``collect_list``) and the
    packer writes a fourth varbyte column ``pos_bin`` (delta-encoded per
    posting, segment bounds implied by tf — codec.delta_encode_segmented).
    Non-positional builds write ``pos_bin`` as NULL; ``bin_bytes`` stays
    the CORE three-column payload either way, so bag-of-words fetch-cost
    routing is unaffected by the positional extra.

    ``profile`` (measurement mode, default off): pass a dict to receive
    per-substage wall seconds — docstore_write, blocks_write, metrics_scan,
    finalize — PLUS noop-format executions of the big lineages
    (docstore_lineage_noop; postings_lineage_noop = compute+shuffle only;
    blocks_lineage_noop = compute+shuffle+pack — the write pass re-runs the
    same lineage, so write_pass − noop ≈ sink cost), so write bandwidth
    separates from job structure in scaling attribution. Profiling roughly
    triples build work; never enable it on a production build."""
    paths = IndexPaths(index_dir)
    manifest = Manifest(paths.manifest)
    writer = IndexWriter(manifest)
    if not resume:
        manifest.reset()
        for p in (paths.docstore, paths.postings, paths.blocks,
                  paths.stats, paths.termstats):
            _rm(p)

    if n_docs is None:
        max_id = docs.agg(F.max(F.col(id_col))).collect()[0][0]
        n_docs = int(max_id) + 1 if max_id is not None else 0
    per = max((n_docs + num_buckets - 1) // max(num_buckets, 1), 1)
    n_buckets = (n_docs + per - 1) // per if n_docs else 0

    pending = [
        b for b in range(n_buckets)
        if not (resume and manifest.is_done("build", _key(b)))
    ]
    group_size = buckets_per_job or max(len(pending), 1)

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *[F.col(c) for c in meta_cols],
    ).withColumn(
        "part", F.least(F.floor(F.col("doc_id") / per), F.lit(n_buckets - 1)).cast("int")
    )

    # Parallelism/file-count discipline: the narrow tokenize stage inherits
    # the source's file splits (a compacted source would serialize it), and
    # a hive-partitioned write multiplies files by tasks×parts unless tasks
    # are part-aligned. Hash-repartition on (part, stripe) fixes both with a
    # single deterministic shuffle — no sampling pass (repartitionByRange
    # would recompute the upstream lineage to sample ranges): full core
    # budget, and each task's rows land in one part dir.
    #
    # The stripe count OVERSAMPLES the partition count ~4×: with distinct
    # keys ≈ partitions, balls-in-bins puts 2-4 keys in an unlucky
    # partition while others sit idle (measured ~2× stage-wall skew,
    # worst exactly when parts ≈ 2×partitions); ≈4 keys per partition in
    # expectation keeps the max/mean load ratio near 1. A (part, term)
    # group still lands in ONE partition regardless of the stripe count —
    # stripes split across terms/doc-ranges, never within a group.
    target_parallelism = spark.sparkContext.defaultParallelism * 2

    def _part_aligned(df: DataFrame, stripe_col) -> DataFrame:
        n_parts = max(len(pending), 1)
        stripes = max((target_parallelism * 4 + n_parts - 1) // n_parts, 1)
        return df.repartition(
            target_parallelism, F.col("part"),
            F.pmod(stripe_col, F.lit(stripes)),
        )

    def _timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        if profile is not None:
            profile[name] = profile.get(name, 0.0) + (time.perf_counter() - t0)
        return out

    def _noop(name: str, df: DataFrame) -> None:
        # measurement mode only: execute the full lineage with the write
        # elided (Spark's noop sink) to split compute from write bandwidth
        if profile is not None:
            _timed(name, lambda: df.write.format("noop").mode("overwrite").save())

    for gstart in range(0, len(pending), group_size):
        group = pending[gstart: gstart + group_size]
        part_col = F.col("part")
        # NO persist: the docstore pass and the postings pass each recompute
        # the narrow tokenize chain from the source scan. Caching the token
        # arrays was measured 3× SLOWER end-to-end at 32 cores (cache-store
        # bandwidth + eviction churn + serialized spill under concurrent
        # tasks dwarf the ~3 s the second tokenize costs) — and at 100 TB a
        # token-array cache cannot fit anyway, so recompute-from-scan is
        # also the honest cluster shape. See BENCH/BASELINE.md.
        enriched = (
            _part_aligned(base.filter(part_col.isin(group)), F.col("doc_id"))
            .withColumn("toks", tokenize_col(F.col("text")))
            .select(
                "part", "doc_id",
                F.size("toks").alias("dl"),
                F.sha2(F.col("text"), 256).alias("content_sha256"),
                "toks",
                *[F.col(c) for c in meta_cols],
            )
        )

        # Per-bucket lineage metrics come from a column-pruned re-scan of
        # the files just written (groupBy part: ONE hash-agg update per row)
        # — NOT from an Observation riding the write. Observation needs
        # 3·|group| conditional aggregate buffers evaluated per row, and
        # that measured as ~30-40% of the ENTIRE build wall-clock at every
        # parallelism level (BENCH diagnostics); the pruned re-scan reads
        # only (part, dl, content_sha256) / (part, n) and is a short, fully
        # parallel job.
        docstore_df = enriched.drop("toks")
        _noop("docstore_lineage_noop", docstore_df)

        # postings: the per-doc (term, tf[, positions]) aggregation is
        # row-local, so it runs inside the narrow Arrow emitter
        # (_emit_postings — row-identical to the old explode + groupBy,
        # with the aggregation EXCHANGE removed from the plan); the aligned
        # repartition is then the build's ONLY shuffle — it clusters each
        # task onto one (part, term-stripe) and the in-partition sort makes
        # every (part, term) group contiguous, which lets BOTH the postings
        # files (term-sorted → parquet row-group pruning) and the block
        # packer reuse it.
        emitted = enriched.select("part", "doc_id", "dl", "toks").mapInPandas(
            _emit_postings(positions),
            schema=POSTINGS_POS_SCHEMA if positions else POSTINGS_SCHEMA,
        )
        postings = _part_aligned(
            emitted, F.xxhash64("term"),
        ).sortWithinPartitions("part", "term", "doc_id")

        # Block packing is NARROW from here: every (part, term) group is a
        # contiguous run inside its sorted, stripe-exclusive partition
        # (_pack_stream). With write_postings the sorted stream is also
        # persisted as the postings table and packed from the files (read
        # back with splitting disabled so no group straddles a task).
        if write_postings:
            _timed("docstore_write",
                   lambda: writer.append_partitioned(docstore_df, paths.docstore))
            _timed("postings_write",
                   lambda: writer.append_partitioned(postings, paths.postings))
            old_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 30))
            try:
                src = spark.read.parquet(paths.postings).filter(
                    part_col.isin(group)
                )
                blocks = src.mapInPandas(_pack_stream, schema=BLOCK_SCHEMA)
                _timed("blocks_write",
                       lambda: writer.append_partitioned(blocks, paths.blocks))
            finally:
                spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)
        else:
            blocks = postings.mapInPandas(_pack_stream, schema=BLOCK_SCHEMA)
            # shuffle-only probe (pre-pack), then shuffle+pack probe: their
            # delta attributes the pack kernel separately from the shuffle
            _noop("postings_lineage_noop", postings)
            _noop("blocks_lineage_noop", blocks)
            if profile is None:
                # The docstore job and the postings→pack→blocks job are
                # INDEPENDENT (separate sinks, both recompute from the
                # source scan) — submit them from two driver threads so
                # the second job's tasks back-fill executors freed by the
                # first job's straggler tail (guide §2.6); Spark's FIFO
                # scheduler gives the earlier job priority, which is
                # exactly the back-fill behaviour wanted. Profile mode
                # keeps them sequential so substage attribution holds.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as pool:
                    f_doc = pool.submit(
                        writer.append_partitioned, docstore_df, paths.docstore)
                    f_blk = pool.submit(
                        writer.append_partitioned, blocks, paths.blocks)
                    f_doc.result()
                    f_blk.result()
            else:
                _timed("docstore_write",
                       lambda: writer.append_partitioned(docstore_df, paths.docstore))
                _timed("blocks_write",
                       lambda: writer.append_partitioned(blocks, paths.blocks))

        doc_m, post_m = _timed(
            "metrics_scan", lambda: _group_metrics(spark, paths, group))
        for b in group:
            dm = doc_m.get(b, {})
            writer.commit(
                "build", _key(b),
                rows=int(dm.get("rows") or 0),
                tokens=int(dm.get("tokens") or 0),
                postings=int(post_m.get(b) or 0),
                sha_agg=str(dm.get("sha") or 0),
            )

    t_fin = time.perf_counter()
    if not (resume and manifest.is_done("finalize", "stats")):
        # corpus stats come from the per-bucket lineage metrics the build
        # jobs already Observed — no re-scan of the docstore (at 100 TB
        # that scan is a whole job's worth of I/O, and it was also a fixed
        # serial cost in the scaling measurements)
        s = manifest.summary()
        n, tot = s["rows"], s["tokens"]
        # one-partition JVM-side literal row — NOT createDataFrame([...]):
        # that parallelizes the list over defaultParallelism Python-backed
        # slices, and the coalesce(1) write then evaluates all of them
        # SERIALLY in one task (measured 4-6 s for this one row at 32
        # cores; this form writes in ~0.3 s)
        stats = spark.range(1).select(
            F.lit(int(n)).cast("long").alias("n_docs"),
            F.lit((float(tot) / n) if n else 0.0).alias("avgdl"),
            F.lit(int(tot)).cast("long").alias("total_tokens"),
        )
        # term statistics from block metadata (df = Σ n, cf = Σ tf_sum,
        # bytes = Σ bin_bytes) — no dependence on the optional postings
        # table, and no binary columns read (bin_bytes is metadata)
        termstats = (
            spark.read.parquet(paths.blocks)
            .groupBy("term")
            .agg(F.sum("n").alias("df"), F.sum("tf_sum").alias("cf"),
                 F.sum("bin_bytes").alias("bytes"))
        )
        # independent sinks — overlap the two finalize writes (guide §2.6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_st = pool.submit(writer.overwrite, stats, paths.stats, coalesce=1)
            f_ts = pool.submit(writer.overwrite, termstats, paths.termstats)
            f_st.result()
            f_ts.result()
        writer.commit("finalize", "stats")
    if profile is not None:
        profile["finalize"] = profile.get("finalize", 0.0) + (
            time.perf_counter() - t_fin)

    return manifest.summary()


def _group_metrics(
    spark: SparkSession, paths: IndexPaths, group: list[int],
) -> tuple[dict, dict]:
    """Per-bucket lineage metrics from column-pruned scans of the freshly
    written group files: (rows, tokens, order-independent content-sha
    checksum) per bucket from the docstore; posting counts per bucket from
    block metadata. Both scans prune to the group's hive partitions and to
    3 / 2 columns — short fully-parallel jobs."""
    from concurrent.futures import ThreadPoolExecutor

    part_in = F.col("part").isin(group)
    sha_num = F.conv(
        F.substring("content_sha256", 1, 15), 16, 10
    ).cast("decimal(38,0)")

    def _doc_rows():
        return (
            spark.read.parquet(paths.docstore)
            .filter(part_in)
            .groupBy("part")
            .agg(
                F.count("*").alias("rows"),
                F.sum("dl").alias("tokens"),
                F.sum(sha_num).alias("sha"),
            )
            .collect()
        )

    def _post_rows():
        return (
            spark.read.parquet(paths.blocks)
            .filter(part_in)
            .groupBy("part")
            .agg(F.sum("n").alias("np"))
            .collect()
        )

    # two independent metadata scans — overlap them (guide §2.6)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_doc, f_post = pool.submit(_doc_rows), pool.submit(_post_rows)
        doc_rows, post_rows = f_doc.result(), f_post.result()
    doc_m = {
        r["part"]: {"rows": r["rows"], "tokens": r["tokens"], "sha": r["sha"]}
        for r in doc_rows
    }
    return doc_m, {r["part"]: r["np"] for r in post_rows}


def _key(bucket: int) -> str:
    return f"bucket={bucket:05d}"


def _rm(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
