"""Bucketed-table co-location: the write-once-shuffle-never contract.

Plan audits proving the property `materialize_bucketed` exists for:
equi-joins and aggregations on the bucket key between tables bucketed
the same way run with ZERO Exchange (and, with sortBy, zero Sort) —
the shuffle is paid once at write time."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rdf_n3_spark.operators.materialize import materialize_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("sig"),
    )
    quality = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("quality"),
    )
    a = materialize_bucketed(docs, "t_docs_b", "doc_id", n_buckets=8)
    b = materialize_bucketed(quality, "t_quality_b", "doc_id", n_buckets=8)
    yield a, b
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_quality_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Disable broadcast joins so the planner must face the shuffle
    question — at real scale neither side of a corpus-sized join fits
    in a broadcast, which is exactly the regime bucketing is for (on
    sandbox-sized tables Spark would otherwise broadcast and mark the
    scans 'Bucketed: false (disabled by query planner)')."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(bucketed_pair, no_broadcast):
    a, b = bucketed_pair
    j = a.join(b, "doc_id").where(F.col("quality") > 3)
    j.collect()  # force AQE final plan
    plan = _plan(j)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_sorted_buckets_also_drop_the_sort(spark, bucketed_pair,
                                           no_broadcast):
    """With the sorted-bucket scan enabled (Spark ≥3.0 ignores write
    order by default because multi-file buckets can't guarantee it),
    the per-task Sort disappears as well — evidencing the writer's
    one-file-per-bucket layout, which is what makes the write order
    trustworthy."""
    old = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
                   "true")
    try:
        a, b = bucketed_pair
        j = a.join(b, "doc_id")
        j.collect()
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "Sort [" not in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old)


def test_bucketed_groupby_is_exchange_free(bucketed_pair):
    a, _ = bucketed_pair
    g = a.groupBy("doc_id").agg(F.sum("sig").alias("s"))
    g.collect()
    assert "Exchange" not in _plan(g), _plan(g)


def test_unbucketed_join_pays_the_exchange(spark, bucketed_pair, no_broadcast):
    """Negative control: the same join against a NON-bucketed side
    does shuffle — the audit above isn't vacuous."""
    a, _ = bucketed_pair
    plain = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("quality"))
    j = a.join(plain, "doc_id")
    j.collect()
    assert "Exchange" in _plan(j), _plan(j)


def test_roundtrip_values(spark, bucketed_pair):
    a, b = bucketed_pair
    got = (
        a.join(b, "doc_id")
        .agg(F.sum(F.col("sig") * F.col("quality")).alias("t"))
        .collect()[0]["t"]
    )
    want = sum((i % 7) * (i % 13) for i in range(2000))
    assert got == want
