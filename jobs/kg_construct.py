#!/usr/bin/env python
"""KG-construction batch job — the spark-submit entrypoint.

Cluster submission (north rule: "runs via spark-submit --py-files"):

    cd /root/repo && zip -qr /tmp/rdf_n3_spark.zip rdf_n3_spark
    spark-submit \
        --py-files /tmp/rdf_n3_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        jobs/kg_construct.py \
        --transcripts  s3://…/transcripts  (or an sf test dir) \
        --graph-root   s3://…/graph \
        --batch-id     2026-08-17 \
        --repartition  4096

The job body is the library pipeline: read transcripts → explicit
repartition by conv_id (north rule) → mention extraction → skolemized
triple emission ∪ entity aggregate → graph materialization with
per-partition lineage rows + metric counters. Re-running with the same
--batch-id is a no-op (checkpointed resume, lineage-gated); a crashed
run re-does only its own uncommitted files.

Local smoke: python jobs/kg_construct.py --sf-dir /root/testdata/sf0.001
             --graph-root /tmp/kg --batch-id b0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local-smoke path: make the repo importable when invoked as
# `python jobs/kg_construct.py` (under spark-submit the package ships
# via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--transcripts", help="path of a transcripts table "
                     "(parquet/Iceberg, input_hint schema)")
    src.add_argument("--sf-dir", help="driver test-data dir; transcripts "
                     "derived from its lineitem parquet")
    ap.add_argument("--graph-root", required=True)
    ap.add_argument("--batch-id", required=True)
    ap.add_argument("--repartition", type=int, default=0,
                    help="explicit conv_id repartition width (0 = leave "
                    "to the source partitioning)")
    ap.add_argument("--profile", action="store_true",
                    help="also write the KB statistics profile beside the "
                    "graph: VoID per-predicate counts (the predicate_counts "
                    "input for plans/bgp.order_patterns) + characteristic "
                    "sets (exact star-join cardinalities)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # under spark-submit the session inherits the submitted conf; the
    # local smoke path falls back to the library defaults
    spark = SparkSession.builder.appName("kg_construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rdf_n3_spark.operators.materialize import materialize_graph
    from rdf_n3_spark.operators.mentions import extract_mentions
    from rdf_n3_spark.operators.triples import entity_triples, mention_triples
    from rdf_n3_spark.sources.transcripts import transcripts

    if args.transcripts:
        t = spark.read.parquet(args.transcripts)
    else:
        t = transcripts(spark, args.sf_dir)
    if args.repartition:
        t = t.repartition(args.repartition, "conv_id")

    # Stage 1: materialize mentions once. The triple union below has
    # TWO consumers of the mention stream (skolemized triples + entity
    # aggregate); Spark does not share common subtrees across union
    # branches, so feeding both from the live plan would tokenize the
    # full corpus twice. Mentions are a small fraction of the corpus
    # (matched tokens only), so writing them is cheap — and the
    # _SUCCESS-gated write makes a resumed run skip straight past the
    # expensive scan+tokenize pass.
    #
    # The gate is keyed by batch-id AND an input fingerprint (source
    # path + input schema + a hash of the extraction module source):
    # re-running the same batch-id against a different --transcripts
    # input, or after an extraction-code change, must NOT silently
    # reuse stale staged mentions — it lands in a fresh staging dir
    # instead. Existence goes through the Hadoop FS API so the skip
    # works on object stores too (os.path.exists is always False
    # there, which silently re-paid the write cost on every resume).
    import hashlib
    import inspect

    import rdf_n3_spark.operators.mentions as mentions_mod

    input_fp = hashlib.md5("|".join([
        args.transcripts or args.sf_dir,
        t.schema.simpleString(),
        hashlib.md5(inspect.getsource(mentions_mod).encode()).hexdigest(),
    ]).encode()).hexdigest()[:12]
    m_path = os.path.join(args.graph_root, "mentions",
                          f"batch={args.batch_id}", f"input={input_fp}")

    def _hadoop_exists(path: str) -> bool:
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return fs.exists(p)

    if not _hadoop_exists(os.path.join(m_path, "_SUCCESS")):
        extract_mentions(t).write.mode("overwrite").parquet(m_path)
    m = spark.read.parquet(m_path)

    # Stage 2: both triple families derive from the staged mentions.
    triples = mention_triples(m).unionByName(entity_triples(m))
    metrics = materialize_graph(spark, triples, args.graph_root, args.batch_id)

    # Stage 3 (optional): the statistics a production store maintains
    # next to the data — tiny outputs (rows ∝ schema shapes, not
    # corpus size), rewritten per batch, no lineage gate needed.  Runs
    # even for a lineage-skipped batch (the triples plan is lazy off
    # the staged mentions), so `--profile` can backfill statistics for
    # an already-committed graph instead of silently writing nothing.
    if args.profile:
        from rdf_n3_spark.operators.kb_stats import (
            characteristic_sets,
            void_stats,
        )

        # both profile tables scan the same KB: pay the staged-mentions
        # pass once, not once per table
        triples.persist()
        prof = os.path.join(args.graph_root, "profile",
                            f"batch={args.batch_id}")
        void_stats(triples).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(prof, "void"))
        characteristic_sets(triples).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(prof, "char_sets"))
        triples.unpersist()
        metrics["profile"] = prof

    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
