"""Per-partition build lineage + resume (SURVEY.md §7.5).

A partition (stage, key) commits by atomically renaming a JSON done-marker
into the manifest directory AFTER its data is fully written — the same
write-data-then-commit-pointer discipline Iceberg snapshots give on a real
cluster (where this class would be an Iceberg table and the marker a snapshot
id). Resume = skip (stage, key) pairs whose marker exists; an interrupted
partition has no marker and is rewritten idempotently (``mode("overwrite")``
on its own directory).
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _marker(self, stage: str, key: str) -> str:
        safe = key.replace("/", "_")
        return os.path.join(self.root, f"{stage}__{safe}.json")

    def reset(self) -> None:
        for f in os.listdir(self.root):
            if f.endswith(".json"):
                os.unlink(os.path.join(self.root, f))

    def is_done(self, stage: str, key: str) -> bool:
        return os.path.exists(self._marker(stage, key))

    def start(self, stage: str, key: str) -> None:
        # a stale in-progress record is informational only; completion is
        # defined solely by the committed marker
        self._pending = {"stage": stage, "key": key, "started_at": time.time()}

    def finish(self, stage: str, key: str, **metrics) -> None:
        record = {
            "stage": stage, "key": key, "status": "done",
            "finished_at": time.time(), **metrics,
        }
        if getattr(self, "_pending", None) and self._pending["key"] == key:
            record["started_at"] = self._pending["started_at"]
        tmp = self._marker(stage, key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, self._marker(stage, key))  # atomic commit

    def records(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.root)):
            if f.endswith(".json"):
                with open(os.path.join(self.root, f)) as fh:
                    out.append(json.load(fh))
        return out

    def summary(self) -> dict:
        recs = self.records()
        return {
            "partitions": len([r for r in recs if r["stage"] == "build"]),
            "rows": sum(r.get("rows", 0) for r in recs),
            "tokens": sum(r.get("tokens", 0) for r in recs),
            "postings": sum(r.get("postings", 0) for r in recs),
        }
