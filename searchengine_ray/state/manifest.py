"""Build manifest — per-partition + per-stage checkpoints with lineage.

Replaces the reference's implicitly-resumable append-pickle posting files
(``Part A/utils.py`` append, ``Part A/posting_file_factory.py:79-99``)
with an explicit JSON manifest: each completed input partition records
its lineage (input path, size, mtime fingerprint) and build metrics
(rows, docs, terms, postings, bytes); each completed stage records its
metrics.  A re-run skips partitions/stages whose fingerprint still
matches — that is what makes a 10^12-turn build resumable.

Writes are atomic (temp file + rename) so a killed build never leaves a
corrupt manifest.
"""

from __future__ import annotations

import json
import os
import time


LAYOUT_VERSION = 2  # v2: docstats hash-partitioned by doc-id range


class BuildManifest:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "build_manifest.json")
        self.data = {"partitions": {}, "stages": {}, "created_at": time.time(),
                     "layout": LAYOUT_VERSION}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)
            if self.data.get("layout") != LAYOUT_VERSION:
                # on-disk layout changed between versions: a resume would
                # mix incompatible artifacts — force a full rebuild
                self.data = {"partitions": {}, "stages": {},
                             "created_at": time.time(), "layout": LAYOUT_VERSION}

    # -- persistence ----------------------------------------------------
    def save(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- partitions -----------------------------------------------------
    @staticmethod
    def fingerprint(input_path: str) -> dict:
        st = os.stat(input_path)
        return {"path": input_path, "bytes": st.st_size, "mtime": st.st_mtime}

    def partition_done(self, pid: str, input_path: str) -> bool:
        rec = self.data["partitions"].get(pid)
        if not rec:
            return False
        fp = self.fingerprint(input_path)
        return (
            rec["lineage"]["path"] == fp["path"]
            and rec["lineage"]["bytes"] == fp["bytes"]
            and rec["lineage"]["mtime"] == fp["mtime"]
        )

    def reconcile(self, current: dict[str, str]) -> list[str]:
        """Reconcile against the CURRENT pid → input-path assignment.

        Input files removed or renamed between runs shift the positional
        pid assignment; without this, leftover tokenized/docstats/runs
        parts for no-longer-existing pids would be globbed into the
        postings merge and corpus stats as ghost documents.  Drops
        manifest records whose pid is gone or whose input path changed,
        deletes checkpoint parts for pids not in the current set, and
        invalidates downstream stages when anything was removed.
        Returns the affected pids."""
        import glob

        removed = []
        for pid, rec in list(self.data["partitions"].items()):
            if current.get(pid) != rec["lineage"]["path"]:
                removed.append(pid)
                del self.data["partitions"][pid]
        for pat in ("tokenized/*.parquet", "runs/*.parquet",
                    "runs_meta/*.parquet", "docstats/*/*.parquet",
                    "runs/*/*.parquet"):
            for f in glob.glob(os.path.join(self.index_dir, pat)):
                pid = os.path.basename(f)[: -len(".parquet")]
                if pid not in current:
                    os.remove(f)
                    if pid not in removed:
                        removed.append(pid)
        if removed:
            self.data["stages"] = {}
            self.save()
        return removed

    def mark_partition(self, pid: str, input_path: str, metrics: dict) -> None:
        self.data["partitions"][pid] = {
            "lineage": self.fingerprint(input_path),
            "metrics": metrics,
            "finished_at": time.time(),
        }
        self.save()

    def invalidate_downstream(self) -> None:
        """Any partition re-ran ⇒ shuffle/aggregate stages must re-run."""
        self.data["stages"] = {}
        self.save()

    # -- stages ---------------------------------------------------------
    def stage_done(self, name: str) -> bool:
        return name in self.data["stages"]

    def mark_stage(self, name: str, metrics: dict | None = None) -> None:
        self.data["stages"][name] = {"metrics": metrics or {}, "finished_at": time.time()}
        self.save()
