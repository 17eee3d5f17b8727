"""Checkpoint manifest store: idempotence, invalidation, resume."""

from __future__ import annotations

import json
import os

from jschon_spark.plans.manifests import (
    ManifestStore,
    run_partitioned,
    schema_fingerprint,
)


def test_schema_fingerprint_stable_and_sensitive():
    a = {"type": "object", "required": ["a"]}
    b = {"required": ["a"], "type": "object"}  # key order must not matter
    assert schema_fingerprint(a) == schema_fingerprint(b)
    assert schema_fingerprint(a) != schema_fingerprint({"type": "object"})


def test_write_read_complete(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.write("2025-06-01", "snapA", "v1", {"n": 10})
    assert store.is_complete("2025-06-01", "snapA", "v1")
    assert not store.is_complete("2025-06-01", "snapB", "v1")   # data changed
    assert not store.is_complete("2025-06-01", "snapA", "v2")   # schema changed
    assert not store.is_complete("2025-06-02", "snapA", "v1")   # other partition
    doc = store.read("2025-06-01")
    assert doc["metrics"] == {"n": 10}


def test_run_partitioned_resume(tmp_path):
    store = ManifestStore(str(tmp_path))
    parts = {"p1": "s1", "p2": "s2", "p3": "s3"}
    ran = []

    def job(p):
        ran.append(p)
        return {"n": 1}

    out1 = run_partitioned(parts, "v1", store, job)
    assert sorted(out1) == ["p1", "p2", "p3"] and ran == ["p1", "p2", "p3"]

    ran.clear()
    out2 = run_partitioned(parts, "v1", store, job)
    assert out2 == {} and ran == []          # full resume: nothing re-runs

    parts["p2"] = "s2b"                      # one partition's data changed
    out3 = run_partitioned(parts, "v1", store, job)
    assert list(out3) == ["p2"] and ran == ["p2"]

    ran.clear()
    out4 = run_partitioned(parts, "v2", store, job)   # constraint bumped
    assert sorted(out4) == ["p1", "p2", "p3"]


def test_crash_mid_run_resumes(tmp_path):
    store = ManifestStore(str(tmp_path))
    parts = {"p1": "s1", "p2": "s2", "p3": "s3"}
    calls = []

    def flaky(p):
        calls.append(p)
        if p == "p2":
            raise RuntimeError("executor lost")
        return {}

    try:
        # serial mode: a crash stops at exactly the failed partition
        run_partitioned(parts, "v1", store, flaky, max_concurrent=1)
    except RuntimeError:
        pass
    assert calls == ["p1", "p2"]
    calls.clear()
    out = run_partitioned(parts, "v1", store, lambda p: {})
    assert sorted(out) == ["p2", "p3"]       # p1's manifest survived


def test_crash_concurrent_resumes_only_unpublished(tmp_path):
    # concurrent mode (round 7): a failing partition propagates, every
    # COMPLETED partition has its manifest published from its own
    # worker thread, and a resume re-runs only unpublished partitions
    store = ManifestStore(str(tmp_path))
    parts = {"p1": "s1", "p2": "s2", "p3": "s3"}

    def flaky(p):
        if p == "p2":
            raise RuntimeError("executor lost")
        return {}

    try:
        run_partitioned(parts, "v1", store, flaky, max_concurrent=3)
    except RuntimeError:
        pass
    calls = []
    out = run_partitioned(
        parts, "v1", store, lambda p: calls.append(p) or {}
    )
    # p2 must re-run (its manifest was never published); completed
    # partitions must not
    assert "p2" in out
    assert all(p not in out or p == "p2" or p in calls for p in parts)
    assert "p1" not in calls or "p1" in out  # only pending re-ran
    final = run_partitioned(parts, "v1", store, lambda p: {})
    assert final == {}                        # everything published now


def test_manifest_file_is_json_with_lineage(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.write("2025-06-01", "snap", "v1", {"n_docs": 5}, extractor_version="1.0.0")
    files = [f for f in os.listdir(tmp_path) if f.endswith(".manifest.json")]
    assert len(files) == 1
    doc = json.load(open(os.path.join(tmp_path, files[0])))
    assert {"partition", "snapshot_id", "constraint_version",
            "extractor_version", "metrics", "written_at"} <= set(doc)
