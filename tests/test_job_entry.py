"""The spark-submit job entrypoint: runs, materializes, resumes."""

from __future__ import annotations

import json
import subprocess
import sys


def run_job(graph_root, batch):
    out = subprocess.run(
        [sys.executable, "jobs/kg_construct.py",
         "--sf-dir", "/root/testdata/sf0.001",
         "--graph-root", str(graph_root),
         "--batch-id", batch,
         "--repartition", "8"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_job_runs_and_resumes(tmp_path):
    root = tmp_path / "graph"
    m = run_job(root, "b0")
    assert not m["skipped"]
    assert m["tables"]["edges"]["n_rows"] > 0
    assert m["tables"]["nodes"]["n_rows"] > 0
    # same batch id again → lineage-gated no-op (checkpointed resume)
    m2 = run_job(root, "b0")
    assert m2 == {"skipped": True, "batch_id": "b0"}
