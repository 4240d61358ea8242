#!/usr/bin/env python
"""Benchmark harness: headline KG-construction queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "turns_per_sec", "value": N, "unit": "turns/sec",
   "queries": {...per-query seconds...}, "sf": ..., "cpus": N, ...}

The headline metric (BASELINE.json) is triple-emission throughput in
turns/sec: wall time of the full pipeline — transcripts → mentions →
skolemized triples + entity aggregation — divided into the transcript
turn count. Scaling-efficiency runs (local[8] vs local[32]) live in
bench_scaling.py → BENCH/BASELINE.md.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_RUNS (default 3 timed runs,
median reported; 1 untimed warm-up for JVM/Arrow).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F


def noop_sink(df) -> int:
    """Force full evaluation without driver collect: count alone lets
    Catalyst prune columns, so fold every column through a hash first
    (mod keeps the ANSI-mode long sum from overflowing)."""
    h = F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003))
    return df.select(F.sum(h).alias("h"), F.count(F.lit(1)).alias("n")).collect()[0]["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    from rdf_n3_spark.session import get_spark
    from rdf_n3_spark.operators.canon import canonical_map
    from rdf_n3_spark.operators.mentions import extract_mentions
    from rdf_n3_spark.operators.triples import entity_triples, mention_triples
    from rdf_n3_spark.sources.n3_source import parse_documents
    from rdf_n3_spark.sources.transcripts import transcripts

    spark = get_spark("bench", cores=cpus, shuffle_partitions=2 * cpus)

    def q_pipeline():
        t = transcripts(spark, sf_dir)
        m = extract_mentions(t)
        return mention_triples(m).unionByName(entity_triples(m))

    def q_parse_udf():
        t = transcripts(spark, sf_dir).where(F.col("turn_idx") == 0)
        docs = t.select(
            F.col("conv_id").alias("doc_id"),
            F.regexp_extract("text", r"(:\S+ :suppliedBy :\S+ \.)$", 1).alias("n3_text"),
        )
        return parse_documents(docs).where(F.col("ok")).select("doc_id", "s", "p", "o")

    def q_canon():
        return canonical_map(extract_mentions(transcripts(spark, sf_dir)))

    queries = {
        "kg_pipeline": q_pipeline,
        "n3_parse_udf": q_parse_udf,
        "entity_canon": q_canon,
    }

    n_turns = transcripts(spark, sf_dir).count()

    # warm-up (JVM + Arrow + parquet footer caches)
    for fn in queries.values():
        noop_sink(fn())

    per_query: dict[str, float] = {}
    for name, fn in queries.items():
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            noop_sink(fn())
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 4)

    total = sum(per_query.values())
    turns_per_sec = round(n_turns / per_query["kg_pipeline"], 1)

    print(json.dumps({
        "metric": "turns_per_sec",
        "value": turns_per_sec,
        "unit": "turns/sec",
        "queries": per_query,
        "sf": sf_dir,
        "cpus": cpus,
        "turns": n_turns,
        "total_sec": round(total, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
