"""Graph materialization: node/edge tables bucketed by entity hash,
with per-partition lineage rows, metric counters, and checkpointed
resume.

North-rule requirement: "graph materialization writes node/edge
Iceberg tables partitioned by entity-hash bucket with per-partition
lineage rows and metric counters for checkpointed resume". The
reference's sink is an in-process set-insert repository
(reference lib/rdf/n3/repository.rb:247-249, 297-313 — duplicate
insert is a no-op); at cluster scale the same set semantics become
``dropDuplicates`` before an idempotent, batch-keyed append.

Layout (parquet here; the same calls target an Iceberg catalog by
swapping ``.parquet(path)`` for ``.writeTo(table).append()`` — the
sandbox has no Iceberg runtime, so the table layout reproduces
Iceberg's ``bucket(N, entity)`` partition transform explicitly):

    <root>/nodes/bucket=<b>/*.parquet      node rows, hash-bucketed
    <root>/edges/bucket=<b>/*.parquet      edge rows, bucketed by subject
    <root>/lineage/*.parquet               one row per (batch, table, bucket)

Lineage rows double as the resume checkpoint AND the metric counters:
``(batch_id, table, bucket, n_rows, content_hash, committed_at)``.
``materialize_graph`` first consults lineage; a batch id that already
committed is skipped entirely (idempotent re-run after a failed or
pre-empted job — "checkpointed resume"). Because the lineage append is
the LAST write, a crash mid-batch leaves no lineage row and the retry
rewrites the batch's files (overwrite-by-batch-partition), never
double-counting.

The bucket function is engine-portable (md5-prefix mod N, mirrored in
the DuckDB oracle) rather than Spark's xxhash64, so correctness checks
and external readers agree on placement.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16

# object values with these prefixes are node references; everything else
# is a literal property value
NODE_REF_RX = r"^(ent|conv|sk):"


def bucket_expr(col, n_buckets: int = N_BUCKETS):
    """Portable entity-hash bucket: first 8 hex chars of md5, mod N.

    Spark: conv(hex, 16, 10); DuckDB oracle: ('0x' || hex)::BIGINT.
    Stays a built-in Column expression (codegen'd, no Python).
    """
    c = col if not isinstance(col, str) else F.col(col)
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def graph_edges(triples: DataFrame) -> DataFrame:
    """Triples whose object is a node reference → edge rows.

    Bucketed by SUBJECT hash: all out-edges of an entity land in one
    bucket, so per-entity reads prune to a single partition (the
    Iceberg ``bucket(N, s)`` layout of SURVEY §1.1). Pure narrow
    filter + projection — no shuffle until the writer partitions.
    """
    return (
        triples.where(F.col("o").rlike(NODE_REF_RX))
        .select("s", "p", "o", bucket_expr("s").alias("bucket"))
    )


def graph_node_props(triples: DataFrame) -> DataFrame:
    """Triples whose object is a literal → node-property rows,
    bucketed by subject like the edge table."""
    return (
        triples.where(~F.col("o").rlike(NODE_REF_RX))
        .select("s", "p", F.col("o").alias("val"), bucket_expr("s").alias("bucket"))
    )


def graph_nodes(triples: DataFrame) -> DataFrame:
    """Node table: every id that appears as a subject or as a node-ref
    object, with kind (id prefix), out/in degree, and bucket.

    Two map-side-combinable aggregations + one outer join on the node
    id. Hub entities (ent:part_hub holds ~20% of mentions) produce one
    partial row per input partition, not a data-volume skew; the final
    join keys are pre-aggregated so AQE's skew-join split handles any
    residual imbalance.
    """
    out_deg = triples.groupBy(F.col("s").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = (
        triples.where(F.col("o").rlike(NODE_REF_RX))
        .groupBy(F.col("o").alias("node_id"))
        .agg(F.count(F.lit(1)).alias("in_degree"))
    )
    return (
        out_deg.join(in_deg, "node_id", "full_outer")
        .select(
            "node_id",
            F.split("node_id", ":").getItem(0).alias("kind"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            bucket_expr("node_id").alias("bucket"),
        )
    )


def _content_hash(df: DataFrame):
    """Order-insensitive content fingerprint per bucket: sum of row
    hashes mod a prime (overflow-safe under ANSI mode)."""
    h = F.pmod(F.xxhash64(*[c for c in df.columns if c != "bucket"]), F.lit(1_000_000_007))
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum(h), F.lit(1_000_000_007)).alias("content_hash"),
    )


def read_lineage(spark: SparkSession, root: str) -> DataFrame | None:
    path = os.path.join(root, "lineage")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def committed_batches(spark: SparkSession, root: str) -> set:
    lin = read_lineage(spark, root)
    if lin is None:
        return set()
    return {r["batch_id"] for r in lin.select("batch_id").distinct().collect()}


def materialize_graph(
    spark: SparkSession,
    triples: DataFrame,
    root: str,
    batch_id: str,
    n_buckets: int = N_BUCKETS,
) -> dict:
    """Write node/edge/prop tables for one batch; return metric counters.

    Resume contract: if ``batch_id`` already has lineage rows the call
    is a no-op returning ``{"skipped": True}`` — re-running a partially
    failed job re-does only uncommitted batches. Data files are laid
    out ``<table>/batch=<id>/bucket=<b>/`` and written with dynamic
    partition overwrite, so a retry of an uncommitted batch replaces
    its own files and nothing else (idempotent).

    Set semantics (reference repository.rb:297-307: duplicate insert is
    a no-op) are applied per batch via dropDuplicates before the write.
    """
    if batch_id in committed_batches(spark, root):
        return {"skipped": True, "batch_id": batch_id}

    t = triples.dropDuplicates(["s", "p", "o"]).localCheckpoint()
    tables = {
        "nodes": graph_nodes(t),
        "edges": graph_edges(t),
        "node_props": graph_node_props(t),
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    lineage_rows = []
    metrics: dict = {"batch_id": batch_id, "skipped": False, "tables": {}}
    try:
        for name, df in tables.items():
            df = df.withColumn("batch", F.lit(batch_id))
            (
                df.repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("batch", "bucket")
                .parquet(os.path.join(root, name))
            )
            stats = _content_hash(df.drop("batch")).collect()
            for r in stats:
                lineage_rows.append(
                    (batch_id, name, r["bucket"], r["n_rows"], r["content_hash"], time.time())
                )
            metrics["tables"][name] = {
                "n_rows": int(sum(r["n_rows"] for r in stats)),
                "n_buckets": len(stats),
            }
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # lineage append LAST = the commit point
    spark.createDataFrame(
        lineage_rows,
        "batch_id string, table string, bucket int, n_rows long, "
        "content_hash long, committed_at double",
    ).coalesce(1).write.mode("append").parquet(os.path.join(root, "lineage"))
    return metrics


def materialize_bucketed(df: DataFrame, table: str, key: str,
                         n_buckets: int = 64,
                         sort: bool = True) -> DataFrame:
    """Persist ``df`` as a Spark-BUCKETED (and, by default, per-bucket
    SORTED) catalog table, and return the re-read table.

    This is the co-location contract the directory-bucketed layout
    above can't give Spark's planner: a catalog table written with
    ``bucketBy(n, key)`` carries its hash distribution into every scan,
    so downstream equi-joins and aggregations on ``key`` between tables
    bucketed the same way (same key, same n) run EXCHANGE-FREE — the
    shuffle is paid ONCE at write time instead of once per query.  At
    100 TB this is the difference between a curation pass that joins
    doc-keyed signal tables five times (``curate_corpus``) re-shuffling
    the corpus five times, and one that reads co-located buckets.

    ``sortBy`` additionally lays each bucket out key-sorted; readers
    that opt in (``spark.sql.legacy.bucketedTableScan.outputOrdering``,
    off by default since 3.0 because multi-file buckets can't
    guarantee order — our one-file-per-bucket write can) drop the
    sort-merge join's per-task Sort too.

    The exchange-free property is pinned by plan audits in
    ``tests/test_bucketed.py`` (join of two bucketed tables: zero
    Exchange, zero Sort; groupBy on the bucket key: zero Exchange).

    The pre-write ``repartition(n_buckets, key)`` aligns the write
    tasks with the bucket assignment (both are pmod-of-murmur3), so
    each bucket lands in EXACTLY ONE file.  That matters twice: the
    reader drops the per-task Sort only when buckets are single-file,
    and without it a 1000-executor write of 64 buckets scatters 64,000
    small files (every task writes every bucket it sees).

    Parquet-backed managed table (``saveAsTable`` is the API that
    records bucketing metadata; path-based ``.parquet()`` writes
    cannot).  In production the same call targets a shared metastore /
    Iceberg catalog with its native ``bucket(N, key)`` transform."""
    w = (
        df.repartition(n_buckets, key)
        .write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
    return df.sparkSession.table(table)


def read_graph(spark: SparkSession, root: str, table: str) -> DataFrame:
    """Read back only COMMITTED batches (anti-join uncommitted files
    away via the lineage table — the reader-side half of the resume
    contract; committed batch count is small → broadcast)."""
    lin = read_lineage(spark, root)
    df = spark.read.parquet(os.path.join(root, table))
    if lin is None:
        return df.limit(0)
    good = lin.select("batch_id").distinct().withColumnRenamed("batch_id", "batch")
    return df.join(F.broadcast(good), "batch", "left_semi")


def read_store(spark: SparkSession, root: str) -> DataFrame:
    """The committed store as ONE (s, p, o) stream: edges ∪ node
    properties, both read back through the lineage gate
    (:func:`read_graph`).  The shape every store-wide consumer takes —
    the --profile statistics, the N-Quads export, BGP answering, and
    cross-build diffing (triples.kb_diff)."""
    return (
        read_graph(spark, root, "edges").select("s", "p", "o")
        .unionByName(
            read_graph(spark, root, "node_props")
            .select("s", "p", F.col("val").alias("o")))
    )


