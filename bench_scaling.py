#!/usr/bin/env python
"""Scaling-efficiency evidence run: the same job at two parallelism
levels (local[8] vs local[32]) on the same input, per the north rule's
N → 4N executor criterion (no real cluster in the sandbox — the driver
instruction maps executors to local cores).

Writes BENCH/BASELINE.md with throughput at both levels and
efficiency = (throughput_4N / throughput_N) / 4  (target ≥ 0.8).

Each level runs in a FRESH JVM (subprocess) so thread pools, shuffle
partitions and memory fractions are truly per-level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (8, 32)


def run_level(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR,
               BENCH_RUNS="3")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results = {c: run_level(c) for c in LEVELS}
    n, four_n = LEVELS
    tn = results[n]["value"]
    t4n = results[four_n]["value"]
    eff = (t4n / tn) / (four_n / n)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling-efficiency evidence ({stamp})

North rule: ≥ 0.8 throughput scaling efficiency between N and 4N
executors. Sandbox protocol: same job (full KG pipeline: transcripts →
mentions → skolemized triples + entity aggregation), same input
({SF_DIR}, {results[n]["turns"]} turns), `local[{n}]` vs `local[{four_n}]`,
fresh JVM per level, median of 3 timed runs after an untimed warm-up.

| parallelism | turns/sec | kg_pipeline sec | n3_parse_udf sec | entity_canon sec |
|---|---|---|---|---|
| local[{n}] | {tn} | {results[n]["queries"]["kg_pipeline"]} | {results[n]["queries"]["n3_parse_udf"]} | {results[n]["queries"]["entity_canon"]} |
| local[{four_n}] | {t4n} | {results[four_n]["queries"]["kg_pipeline"]} | {results[four_n]["queries"]["n3_parse_udf"]} | {results[four_n]["queries"]["entity_canon"]} |

**Scaling efficiency = ({t4n} / {tn}) / {four_n // n} = {eff:.3f}**
(target ≥ 0.8 → {"PASS" if eff >= 0.8 else "MISS"})

Shuffle partitions are sized 2×cores per level so the 4N run is not
partition-starved; AQE enabled at both levels.
""")
    print(json.dumps({"efficiency": round(eff, 3),
                      "throughput": {str(c): results[c]["value"] for c in LEVELS}}))


if __name__ == "__main__":
    main()
