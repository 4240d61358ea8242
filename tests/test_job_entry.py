"""The spark-submit job entrypoint: runs, materializes, resumes."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_job(graph_root, batch, sf_dir="/root/testdata/sf0.001"):
    out = subprocess.run(
        [sys.executable, "jobs/kg_construct.py",
         "--sf-dir", sf_dir,
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
    # the mentions stage is staged under an input-fingerprint dir, so a
    # re-run of the same batch against a DIFFERENT input cannot reuse
    # stale mentions (ADVICE r2)
    staged = sorted(os.listdir(root / "mentions" / "batch=b0"))
    assert len(staged) == 1 and staged[0].startswith("input=")
    # same batch id again → lineage-gated no-op (checkpointed resume)
    m2 = run_job(root, "b0")
    assert m2 == {"skipped": True, "batch_id": "b0"}
    assert sorted(os.listdir(root / "mentions" / "batch=b0")) == staged


def test_job_restages_mentions_for_different_input(tmp_path):
    """Same batch-id, different input path → a fresh fingerprint dir
    (no silent reuse of stale staged mentions)."""
    root = tmp_path / "graph"
    run_job(root, "b0")
    alt = tmp_path / "sfalt"
    os.symlink("/root/testdata/sf0.001", alt)
    run_job(root, "b0", sf_dir=str(alt))
    staged = sorted(os.listdir(root / "mentions" / "batch=b0"))
    assert len(staged) == 2 and all(s.startswith("input=") for s in staged)


def test_job_profile_stage(tmp_path):
    """--profile writes the KB statistics beside the graph: VoID
    per-predicate counts (the bgp order_patterns input) and the
    characteristic-set profile."""
    root = tmp_path / "graph"
    out = subprocess.run(
        [sys.executable, "jobs/kg_construct.py",
         "--sf-dir", "/root/testdata/sf0.001",
         "--graph-root", str(root),
         "--batch-id", "b0",
         "--repartition", "8",
         "--profile"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["profile"].endswith("profile/batch=b0")
    import duckdb
    void = duckdb.sql(
        f"SELECT p, n_triples FROM '{m['profile']}/void/*.parquet'").fetchall()
    preds = {p for p, _ in void}
    assert {"rdf:type", ":refersTo", ":mentionCount"} <= preds
    cs = duckdb.sql(
        f"SELECT count(*) FROM '{m['profile']}/char_sets/*.parquet'").fetchone()
    assert cs[0] >= 2  # at least the mention shape and the entity shape
