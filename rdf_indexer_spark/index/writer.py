"""The index's single write/commit seam (VERDICT r3 item 6).

Every mutation of the on-disk index — bucket data writes during build and
append, the stats/termstats finalize, tombstone deletes — funnels through
:class:`IndexWriter`, so the storage backend is swappable in ONE place.
This container has no Iceberg runtime, so the implementation is
hive-partitioned parquet + the JSON manifest; the mapping onto Iceberg for
a real cluster is documented per method and is 1:1:

=====================  =====================================================
this writer             Iceberg equivalent
=====================  =====================================================
``append_partitioned``  ``table.newReplacePartitions()`` (dynamic partition
                        overwrite) — produces a snapshot
``overwrite``           ``table.newOverwrite()`` full-table replace
``append_rows``         ``table.newAppend()``; for tombstones specifically,
                        Iceberg v2 positional/equality DELETE files
``commit``              the snapshot commit: the returned ``snapshot_id``
                        is what Iceberg stamps on the table metadata; here
                        it lands in the manifest row (lineage + metrics),
                        which is exactly how the build's resume logic finds
                        committed work
=====================  =====================================================

Atomicity discipline is the same write-data-then-commit-pointer order
Iceberg uses: data files are fully written BEFORE ``commit`` publishes the
marker (manifest.finish's atomic rename), so a crash between the two leaves
an uncommitted, idempotently-rewritable partition — never a torn index.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from .manifest import Manifest


class IndexWriter:
    """Parquet-backed implementation of the index write/commit seam."""

    def __init__(self, manifest: Manifest | None = None):
        # manifest=None gives a data-only writer (no commit surface) for
        # callers that publish their own lineage
        self.manifest = manifest
        # snapshot id for the NEXT commit — allocated up front so data
        # files written before the commit could embed it (Iceberg writes
        # data files under the snapshot being staged)
        self._staged: str = self._new_snapshot_id()

    @staticmethod
    def _new_snapshot_id() -> str:
        return uuid.uuid4().hex

    # -- data writes (uncommitted until commit()) --------------------------

    def append_partitioned(self, df: DataFrame, path: str) -> None:
        """Dynamic partition overwrite by ``part``: reruns replace only the
        buckets present in ``df``, never committed ones. Iceberg:
        ``newReplacePartitions()`` on a table partitioned by ``part``."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part")
            .parquet(path)
        )

    def overwrite(self, df: DataFrame, path: str, *, coalesce: int | None = None) -> None:
        """Full replace (stats / termstats). Iceberg: ``newOverwrite()``."""
        if coalesce:
            df = df.coalesce(coalesce)
        df.write.mode("overwrite").parquet(path)

    def overwrite_partitioned(self, df: DataFrame, path: str) -> None:
        """Full-table rewrite keeping the hive ``part`` layout — unlike
        :meth:`append_partitioned` this also drops partitions absent from
        ``df`` (a fully-deleted bucket must disappear, not linger), and it
        is safe when ``df``'s lineage READS ``path`` (the compaction
        shape): data lands in a staging directory first, then a pointer
        swap replaces the old table — the same new-files-then-commit order
        Iceberg's ``RewriteDataFilesAction`` uses (a crash mid-stage
        leaves the old table untouched; a crash between the two renames
        leaves ``<path>.old`` to recover from)."""
        import os
        import shutil

        staging = path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("part")
            .parquet(staging)
        )
        old = path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)

    def append_rows(self, df: DataFrame, path: str) -> None:
        """Blind append (tombstones). Iceberg: ``newAppend()`` — or, for
        deletes proper, v2 positional delete files whose rows are exactly
        these (doc_id) tuples."""
        df.write.mode("append").parquet(path)

    # -- commit ------------------------------------------------------------

    def commit(self, stage: str, key: str, **metrics) -> str:
        """Publish the manifest row for (stage, key) with the staged
        snapshot id + lineage metrics. Returns the snapshot id. The marker
        rename is atomic (manifest.finish), after which resume treats the
        partition as done — the Iceberg snapshot-commit moment."""
        if self.manifest is None:
            raise ValueError("data-only IndexWriter has no manifest to commit to")
        snap = self._staged
        self.manifest.finish(stage, key, snapshot_id=snap, **metrics)
        self._staged = self._new_snapshot_id()
        return snap
