"""Per-partition checkpoint manifests with lineage + metrics.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". jschon analogue (precedent, not a port): the catalog's
URI-keyed schema cache that makes reconstruction idempotent
(/root/reference/jschon/catalog/__init__.py:281-297).

A manifest is one small JSON file per (table partition, constraint
version): ``{partition, snapshot_id, constraint_version,
extractor_version, metrics, written_at}``. A re-run skips partitions
whose manifest matches the current (snapshot_id, constraint_version)
— so a schema change or data change invalidates exactly the affected
partitions. Manifests are driver-side by design (they gate job
submission; executors never read them). On a real deployment
``snapshot_id`` is the Iceberg snapshot id; the parquet stand-in
fingerprints the partition's file listing.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable


CONSTRAINT_VERSION_KEY = "constraint_version"


def schema_fingerprint(schema: Any) -> str:
    """Stable content-hash of a schema document = constraint version."""
    blob = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def partition_snapshot_id(partition_path: str) -> str:
    """Parquet stand-in for an Iceberg snapshot id: fingerprint of the
    partition directory's (name, size, mtime) listing."""
    entries = []
    if os.path.isdir(partition_path):
        for name in sorted(os.listdir(partition_path)):
            p = os.path.join(partition_path, name)
            st = os.stat(p)
            entries.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    blob = "\n".join(entries)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class ManifestStore:
    root: str

    def _path(self, partition: str) -> str:
        safe = partition.replace("/", "_").replace("=", "-")
        return os.path.join(self.root, f"{safe}.manifest.json")

    def read(self, partition: str) -> dict | None:
        p = self._path(partition)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def write(
        self,
        partition: str,
        snapshot_id: str,
        constraint_version: str,
        metrics: dict,
        extractor_version: str | None = None,
    ) -> dict:
        os.makedirs(self.root, exist_ok=True)
        doc = {
            "partition": partition,
            "snapshot_id": snapshot_id,
            CONSTRAINT_VERSION_KEY: constraint_version,
            "extractor_version": extractor_version,
            "metrics": metrics,
            "written_at": int(time.time()),
        }
        tmp = self._path(partition) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(doc, f, sort_keys=True, indent=1)
        os.replace(tmp, self._path(partition))  # atomic publish
        return doc

    def is_complete(
        self, partition: str, snapshot_id: str, constraint_version: str
    ) -> bool:
        doc = self.read(partition)
        return (
            doc is not None
            and doc.get("snapshot_id") == snapshot_id
            and doc.get(CONSTRAINT_VERSION_KEY) == constraint_version
        )

    def pending_partitions(
        self,
        partitions: dict[str, str],
        constraint_version: str,
    ) -> list[str]:
        """partitions: {partition -> snapshot_id}; returns those to run."""
        return [
            p
            for p, snap in sorted(partitions.items())
            if not self.is_complete(p, snap, constraint_version)
        ]


def run_partitioned(
    partitions: dict[str, str],
    constraint_version: str,
    store: ManifestStore,
    job: Callable[[str], dict],
    extractor_version: str | None = None,
    max_concurrent: int = 3,
) -> dict[str, dict]:
    """Idempotent driver loop: run ``job(partition) -> metrics`` for
    each pending partition, publishing a manifest after each success.
    A crash mid-run resumes exactly at the first unpublished partition
    boundary (each partition's manifest is still written immediately
    after ITS job completes, so at most ``max_concurrent`` partitions
    of work are re-run after a crash).

    Partitions are independent by construction, so up to
    ``max_concurrent`` jobs run concurrently from driver threads
    (guide §2.6: one job's stage tail back-fills executors freed by
    another's ramp-up; 2-3 in flight is enough). Set 1 to restore the
    strictly serial round-6 behavior.
    """
    results: dict[str, dict] = {}
    pending = list(store.pending_partitions(partitions, constraint_version))
    if not pending:
        return results
    if max_concurrent <= 1 or len(pending) == 1:
        for part in pending:
            metrics = job(part)
            results[part] = store.write(
                part, partitions[part], constraint_version, metrics,
                extractor_version,
            )
        return results
    from concurrent.futures import ThreadPoolExecutor

    def run_one(part: str) -> tuple[str, dict]:
        metrics = job(part)
        # publish the manifest in the worker thread, right after the
        # partition's own job — preserves the per-partition
        # crash-resume contract
        return part, store.write(
            part, partitions[part], constraint_version, metrics,
            extractor_version,
        )

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        for part, manifest in pool.map(run_one, pending):
            results[part] = manifest
    return results
