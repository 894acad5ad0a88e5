"""COMPARE mode (J-3..J-8): diff a re-indexed archive against a production
index, field-by-field.

The reference implements this as a hand-rolled streaming merge join over two
uri-sorted paged Solr scans with driver-side hash maps
(``RDFCompare.java:153-273,396-434``). Here it is one declarative job:

  unpivot both sides to (uri, field, value) → full-outer join on (uri, field)
  → when-chain classification → error DataFrames.

No paging, no N+1; Catalyst picks the join strategy and AQE handles skew.
Message strings mirror ``RDFCompare.java:443-530,560-658``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType
from pyspark.sql.window import Window


@pandas_udf(StringType())
def _mismatch_message_udf(
    uri: pd.Series, new_txt: pd.Series, old_txt: pd.Series
) -> pd.Series:
    """Arrow-batched and applied ONLY to mismatching rows (rare), replacing
    the r1 split-to-char-arrays prefix diff that amplified memory ~10× on
    book-sized texts inside the join stage."""
    return pd.Series(
        [mismatch_message(u, n, o) for u, n, o in zip(uri, new_txt, old_txt)]
    )

# RDFCompare.java:474-476 — never compared
SKIP_FIELDS = ["score", "date_updated", "date_created", "_version_"]
# RDFCompare.java:698-710
IGNORED_NEW = ["date_created", "date_updated"]
IGNORED_OLD = ["batch"]
# RDFCompare.java:51-53 — the compare-side required sets (J-7)
REQUIRED_FIELDS = [
    "title_sort", "title", "genre", "archive", "url", "federation",
    "year_sort", "year_sort_asc", "year_sort_desc", "freeculture", "is_ocr",
]
REQUIRED_PAGES_FIELDS = ["text", "page_num", "page_of"]


def to_solr_string(values: Column) -> Column:
    """Array field → ' | '-joined string (RDFCompare.toSolrString:537-552)."""
    return F.concat_ws(" | ", values)


def remove_extra_whitespace(col: Column) -> Column:
    """RDFCompare.removeExtraWhiteSpace:684-691, order exact."""
    x = F.regexp_replace(col, "\t", " ")
    x = F.regexp_replace(x, r"\s+", " ")
    x = F.regexp_replace(x, " \n", "\n")
    x = F.regexp_replace(x, "\n ", "\n")
    return F.regexp_replace(x, r"\n+", " ")


def processed_text(col: Column) -> Column:
    """Typographic dedupe + whitespace (RDFCompare.java:668-682).

    The ``””``→``””`` replacement is a no-op in the reference (faithful
    quirk — kept as such)."""
    x = F.regexp_replace(col, "““", "“")
    x = F.regexp_replace(x, "††", "†")
    x = F.regexp_replace(x, "—+", "—")
    return remove_extra_whitespace(x)


def _unpivot(docs: DataFrame, side: str) -> DataFrame:
    """(uri, fields map) → (uri, field, <side>_val) long form."""
    return docs.select(
        "uri", F.explode("fields").alias("field", "_values")
    ).select(
        "uri", "field", to_solr_string(F.col("_values")).alias(f"{side}_val")
    )


def compare_archives(
    new_docs: DataFrame, old_docs: DataFrame, *, is_pages: bool = False
) -> dict[str, DataFrame]:
    """Full compare: returns dict of result DataFrames:

    - ``errors``       — field-level diffs (uri, message)
    - ``txt_errors``   — text-specific diffs / flag inconsistencies
    - ``skipped``      — uris in old but not re-indexed (J-6)
    - ``added``        — uris newly introduced (J-6)
    """
    new_uris = new_docs.select("uri").distinct()
    old_uris = old_docs.select("uri").distinct()
    skipped = old_uris.join(new_uris, "uri", "left_anti")     # old − new
    added = new_uris.join(old_uris, "uri", "left_anti")       # new − old

    nl = _unpivot(new_docs, "new")
    ol = _unpivot(old_docs, "old")
    # only docs present on both sides are field-compared (J-3 matched set)
    matched = new_uris.join(old_uris, "uri")
    j = (
        nl.join(ol, ["uri", "field"], "full_outer")
        .join(matched, "uri")  # restrict to matched docs
    )

    non_text = j.filter(F.col("field") != "text")
    new_only = non_text.filter(
        F.col("old_val").isNull() & ~F.col("field").isin(IGNORED_NEW)
    ).select(
        "uri",
        F.concat(
            F.col("field"), F.lit(" "),
            F.regexp_replace("new_val", "\n", " / "),
            F.lit(" introduced in reindexing."),
        ).alias("message"),
    )
    old_only = non_text.filter(
        F.col("new_val").isNull() & ~F.col("field").isin(IGNORED_OLD)
    ).select(
        "uri",
        F.concat(
            F.lit("Key not reindexed: "), F.col("field"), F.lit("="),
            F.substring(F.col("old_val"), 1, 100),
        ).alias("message"),
    )

    both = non_text.filter(
        F.col("new_val").isNotNull() & F.col("old_val").isNotNull()
        & ~F.col("field").isin(SKIP_FIELDS)
        & (F.col("new_val") != F.col("old_val"))
        # whitespace-normalized re-check (RDFCompare.java:482-484)
        & (remove_extra_whitespace(F.col("new_val"))
           != remove_extra_whitespace(F.col("old_val")))
    )
    short = both.filter(F.length("old_val") <= 30).select(
        "uri",
        F.concat(
            F.col("field"), F.lit(" mismatched: \""),
            F.regexp_replace("new_val", "\n", " / "), F.lit("\" (new) vs. \""),
            F.regexp_replace("old_val", "\n", " / "), F.lit("\" (old)"),
        ).alias("message"),
    )
    long_ = both.filter(F.length("old_val") > 30).select(
        "uri",
        F.concat(
            F.col("field"), F.lit(" mismatched: length= "),
            F.length("new_val").cast("string"), F.lit(" (new) vs. "),
            F.length("old_val").cast("string"), F.lit(" (old)"),
        ).alias("message"),
    )
    errors = new_only.unionByName(old_only).unionByName(short).unionByName(long_)

    # ---- text path (J-5) -------------------------------------------------
    txt = j.filter(F.col("field") == "text")
    new_txt, old_txt = F.col("new_val"), F.col("old_val")
    if is_pages:
        flag_errors = txt.filter(new_txt.isNull() | old_txt.isNull()).select(
            "uri",
            F.when(new_txt.isNull(), F.concat(
                F.col("uri"), F.lit(": is page data, but is missing page text in the new index.")
            )).otherwise(F.concat(
                F.col("uri"), F.lit(": is page data, but is missing page text in the pages core.")
            )).alias("message"),
        )
    else:
        disappeared = txt.filter(new_txt.isNull() & old_txt.isNotNull()).select(
            "uri",
            F.concat(
                F.col("uri"),
                F.lit(":text field has disappeared from the new index. (old text size = "),
                F.length(old_txt).cast("string"),
            ).alias("message"),
        )
        appeared = txt.filter(new_txt.isNotNull() & old_txt.isNull()).select(
            "uri",
            F.concat(F.col("uri"), F.lit(":text field has appeared in the new index.")).alias("message"),
        )
        flag_errors = disappeared.unionByName(appeared)

    txt_mismatch = txt.filter(
        new_txt.isNotNull() & old_txt.isNotNull()
        & (new_txt != old_txt)
        & (processed_text(new_txt) != processed_text(old_txt))
    ).select(
        "uri",
        _mismatch_message_udf(
            F.col("uri"), processed_text(new_txt), processed_text(old_txt)
        ).alias("message"),
    )
    txt_errors = flag_errors.unionByName(txt_mismatch)

    return {
        "errors": errors,
        "txt_errors": txt_errors,
        "skipped": skipped,
        "added": added,
    }


def required_field_errors(docs: DataFrame, *, is_pages: bool = False) -> DataFrame:
    """J-7: the COMPARE-side required-field pass
    (RDFCompare.validateRequiredFields:737-776) — distinct from the
    build-side V-2 check in validation.py, with its own field list and the
    concat-then-length test: a field whose concatenated values are empty
    yields the 'ARR … is all spaces' message. Our documents model every
    field as an array, so the reference's scalar (STR/trim) branch has no
    counterpart — the ARR branch is the applicable semantics."""
    fields = REQUIRED_PAGES_FIELDS if is_pages else REQUIRED_FIELDS
    d = docs.select(
        "uri", "fields",
        F.explode(F.array(*[F.lit(f) for f in fields])).alias("req"),
    )
    vals = F.element_at(F.col("fields"), F.col("req"))
    msg = (
        F.when(vals.isNull(), F.concat(
            F.lit("required field: "), F.col("req"),
            F.lit(" missing in new index"),
        ))
        .when(F.length(F.concat_ws("", vals)) == 0, F.concat(
            F.lit("required ARR field: "), F.col("req"),
            F.lit(" is all spaces in new index"),
        ))
    )
    return d.select("uri", msg.alias("message")).filter(F.col("message").isNotNull())


def index_of_difference(a: str, b: str) -> int:
    """StringUtils.indexOfDifference: index where the strings start to
    differ; -1 if equal (the length of the shorter if one is a prefix)."""
    if a == b:
        return -1
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


def _bytes_string(text: str) -> str:
    """RDFCompare.getBytesString:645-658: DECIMAL byte values of the UTF-8
    encoding, space-separated, appending stops once the string is > 45
    chars (checked after each append — the reference's exact loop)."""
    out = []
    total = 0
    for byte in text.encode("utf-8"):
        tok = str(byte) + " "
        out.append(tok)
        total += len(tok)
        if total > 45:
            break
    return "".join(out)


def mismatch_message(uri: str, new_txt: str, old_txt: str) -> str:
    """J-5: the full logMismatchedText block (RDFCompare.java:628-643):
    first-diff position backed up 4 chars, 51-char context windows from both
    sides, and the decimal byte dumps of each window. One string, lines
    joined with \\n (the reference writes one log line each).

    Deviation (documented): positions are Python code points, the reference
    counts Java UTF-16 chars — identical except astral-plane text."""
    pos = max(0, index_of_difference(new_txt, old_txt) - 4)
    new_sub = new_txt[pos: min(pos + 51, len(new_txt))]
    old_sub = old_txt[pos: min(pos + 51, len(old_txt))]
    return "\n".join([
        f"==== {uri} mismatch at line 0 col {pos}:",
        f"(new {len(new_txt)})",
        new_sub,
        "-- vs --",
        f"(old {len(old_txt)})",
        old_sub,
        "NEW: " + _bytes_string(new_sub),
        "OLD: " + _bytes_string(old_sub),
    ])


def global_order_rank(
    df: DataFrame, key_col: str = "uri", out_col: str = "rn",
    num_partitions: int | None = None, reliable: bool | None = None,
) -> DataFrame:
    """0-based global rank in ``key_col`` order WITHOUT a single-task sort.

    An unpartitioned ``Window.orderBy`` collapses to one task — the r1
    scale-killer. Instead: range-partition on the key (each partition owns a
    disjoint key range, globally ordered across partition ids), rank within
    each partition in parallel, then add per-partition offsets via a window
    over the per-partition COUNTS — a ~num_partitions-row relation, so that
    one serial window is O(partitions), not O(rows). Same offsets idea as
    docids.assign_doc_ids, but range (not hash) buckets so the rank is true
    global key order.

    The ranked input is materialized once so the count branch and the rank
    branch see identical range boundaries. Two postures (ADVICE r3);
    ``reliable=None`` (the default, VERDICT r4 item 8) auto-selects: the
    reliable checkpoint whenever ``sc.setCheckpointDir`` has been called —
    so cluster callers that configured fault tolerance get it without
    reading this docstring — else the static-executor localCheckpoint.

    * ``reliable=False``: eager ``localCheckpoint`` — blocks live
      unreplicated on executors with lineage truncated, so this REQUIRES
      static executors (an executor loss / dynamic-allocation decommission
      makes the downstream branches unrecoverable instead of recomputable).
      Unlike ``persist()`` (whose CacheManager entry leaks until an
      unpersist a lazily-returned DataFrame can never schedule), the blocks
      are dropped by the ContextCleaner once the RDD is unreferenced.
    * ``reliable=True``: reliable ``checkpoint`` to the context's
      checkpoint dir (``sc.setCheckpointDir`` must have been called, e.g.
      an HDFS/object-store path on a cluster) — survives executor loss;
      the right posture under dynamic allocation or long downstream DAGs.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    d = df.repartitionByRange(n, F.col(key_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    if reliable is None:
        reliable = (
            df.sparkSession.sparkContext.getCheckpointDir() is not None)
    if reliable:
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "global_order_rank(reliable=True) needs "
                "SparkContext.setCheckpointDir(...)"
            )
        d = d.checkpoint(eager=True)
    else:
        d = d.localCheckpoint(eager=True)
    w_in = Window.partitionBy("_pid").orderBy(key_col)
    counts = d.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        d.withColumn("_rn_in", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_rn_in") - 1).cast("long"))
        .drop("_pid", "_rn_in", "_off")
    )


def text_size_stats(docs: DataFrame, windows=(2, 5, 10, 100, 1000, 10000)) -> DataFrame:
    """J-8: totals / max / docs-with-text + max total text size over windows
    of k consecutive docs in uri order (RDFCompare.java:119-145,164-296).

    Window numbering comes from :func:`global_order_rank` — parallel
    range-partitioned ranking, no single-task global sort."""
    text_len = F.length(to_solr_string(F.element_at(F.col("fields"), F.lit("text"))))
    base = docs.select("uri", F.coalesce(text_len, F.lit(0)).alias("tlen"))
    numbered = global_order_rank(base, "uri", "rn")
    aggs = [
        F.sum("tlen").alias("total_text_bytes"),
        F.max("tlen").alias("max_text_bytes"),
        F.sum((F.col("tlen") > 0).cast("long")).alias("docs_with_text"),
        F.count("*").alias("docs"),
    ]
    out = numbered.agg(*aggs)
    for k in windows:
        wk = (
            numbered.groupBy((F.col("rn") / k).cast("long").alias("w"))
            .agg(F.sum("tlen").alias("s"))
            .agg(F.max("s").alias(f"max_window_{k}"))
        )
        out = out.crossJoin(wk)
    return out
