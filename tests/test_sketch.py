"""KMV distinct-count sketch: exactness below k, deterministic
estimator at k, partition independence."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from rdf_n3_spark.operators.sketch import _DENOM, kmv_distinct


def _rows(df):
    return {
        r["key"]: (r["n_seen"], r["kth_hash"], r["est_distinct"])
        for r in df.collect()
    }


def test_exact_below_k(spark):
    data = [("a", f"v{i}") for i in range(10)] * 3 + [("b", "only")]
    df = spark.createDataFrame(data, ["key", "val"])
    got = _rows(kmv_distinct(df, "key", F.col("val"), k=64))
    assert got["a"] == (10, None, 10)
    assert got["b"] == (1, None, 1)


def test_estimator_matches_python_replay_and_is_close(spark):
    k, n = 64, 2000
    vals = [f"item-{i}" for i in range(n)]
    df = spark.createDataFrame([("g", v) for v in vals], ["key", "val"])
    got = _rows(kmv_distinct(df, "key", F.col("val"), k=k))["g"]
    hs = sorted(hashlib.md5(v.encode()).hexdigest() for v in set(vals))
    kth = hs[k - 1]
    est = math.floor(float(k - 1) * float(_DENOM) / float(int(kth[:15], 16)))
    assert got == (k, kth, est)
    # statistical sanity: KMV stderr ~ 1/sqrt(k-2) ≈ 13% at k=64
    assert abs(est - n) / n < 0.4


def test_partition_independent(spark):
    data = [("g", f"x{i}") for i in range(500)]
    a = spark.createDataFrame(data, ["key", "val"]).repartition(1)
    b = spark.createDataFrame(data, ["key", "val"]).repartition(17, "val")
    ra = _rows(kmv_distinct(a, "key", F.col("val"), k=32))
    rb = _rows(kmv_distinct(b, "key", F.col("val"), k=32))
    assert ra == rb


def test_merge_equals_direct_sketch(spark):
    """bottom-k(bottom-k(A) ∪ bottom-k(B)) = bottom-k(A ∪ B): merging
    two shard sketches (overlapping values included) finishes to the
    same row as sketching the union directly — the daily→monthly
    rollup property."""
    from rdf_n3_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    a_rows = [("g", f"x{i}") for i in range(120)] + [("only_a", "v")]
    b_rows = [("g", f"x{i}") for i in range(80, 250)] + [("only_b", "w")]
    a = spark.createDataFrame(a_rows, ["key", "val"])
    b = spark.createDataFrame(b_rows, ["key", "val"])
    merged = kmv_estimate(
        kmv_merge(kmv_sketch(a, "key", F.col("val"), k=32),
                  kmv_sketch(b, "key", F.col("val"), k=32), "key", k=32),
        "key", k=32)
    direct = kmv_distinct(a.unionByName(b), "key", F.col("val"), k=32)
    assert _rows(merged) == _rows(direct)


def test_no_per_key_rank_window_in_plan(spark):
    """Scale-shape audit (VERDICT r3 item 3): the per-key bottom-k must
    NOT be a rank window over the full distinct hash stream — a hot key
    would funnel 10⁹ rows through one reducer's sort.  The plan is
    distinct → per-partition mapInPandas prune → bounded collect/sort
    merge: no Window operator anywhere, and no Sort other than inside
    the tiny array_sort expression (which never appears as a plan node)."""
    df = spark.createDataFrame([("g", f"x{i}") for i in range(100)],
                               ["key", "val"])
    out = kmv_distinct(df, "key", F.col("val"), k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Sort" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_duplicates_do_not_inflate(spark):
    base = [("g", f"x{i}") for i in range(300)]
    df1 = spark.createDataFrame(base, ["key", "val"])
    df2 = spark.createDataFrame(base * 5, ["key", "val"])
    assert _rows(kmv_distinct(df1, "key", F.col("val"), k=32)) == _rows(
        kmv_distinct(df2, "key", F.col("val"), k=32)
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

from rdf_n3_spark.operators.sketch import (  # noqa: E402
    cms_lookup,
    cms_merge,
    cms_sketch,
)


def _freqs(df):
    return {r["v"]: r["est_count"] for r in df.collect()}


def _zipf_stream(spark, n_kinds=120, reps=4):
    rows = [(f"tok{i}",) for i in range(n_kinds) for _ in range(1 + i % reps)]
    return spark.createDataFrame(rows, ["val"])


def test_cms_upper_bound_and_collisions(spark):
    """Every estimate ≥ the true count (the count-min guarantee), and
    with a deliberately tiny width at least one estimate is a STRICT
    overestimate — proving the test isn't vacuously exact."""
    df = _zipf_stream(spark)
    exact = {
        r["val"]: r["n"]
        for r in df.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sk = cms_sketch(df, F.col("val"), depth=2, width=16)
    got = _freqs(cms_lookup(sk, df, F.col("val"), depth=2, width=16))
    assert set(got) == set(exact)
    assert all(got[v] >= exact[v] for v in exact)
    assert any(got[v] > exact[v] for v in exact), "width=16 must collide"


def test_cms_accurate_at_real_width(spark):
    """At the default-ish width the min-over-depth kills collisions on
    a small stream: estimates equal exact counts."""
    df = _zipf_stream(spark)
    exact = {
        r["val"]: r["n"]
        for r in df.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sk = cms_sketch(df, F.col("val"), depth=4, width=4096)
    got = _freqs(cms_lookup(sk, df, F.col("val"), depth=4, width=4096))
    assert got == exact


def test_cms_merge_is_exact(spark):
    """cms_merge(sketch(A), sketch(B)) == sketch(A ∪ B) row-for-row:
    the fold is an elementwise counter sum with NO approximation, so
    shard rollups are bit-identical to one-shot sketches."""
    a = _zipf_stream(spark, n_kinds=80)
    b = _zipf_stream(spark, n_kinds=120)  # overlapping kinds
    merged = cms_merge(cms_sketch(a, F.col("val")), cms_sketch(b, F.col("val")))
    direct = cms_sketch(a.unionByName(b), F.col("val"))
    as_rows = lambda d: {(r["d"], r["col"]): r["cnt"] for r in d.collect()}  # noqa: E731
    assert as_rows(merged) == as_rows(direct)


def test_cms_partition_independent(spark):
    df1 = _zipf_stream(spark).repartition(1)
    df2 = _zipf_stream(spark).repartition(13, "val")
    r1 = {(r["d"], r["col"]): r["cnt"]
          for r in cms_sketch(df1, F.col("val")).collect()}
    r2 = {(r["d"], r["col"]): r["cnt"]
          for r in cms_sketch(df2, F.col("val")).collect()}
    assert r1 == r2


def test_cms_unseen_probe_is_zero(spark):
    df = _zipf_stream(spark, n_kinds=10)
    sk = cms_sketch(df, F.col("val"), depth=4, width=65536)
    probes = spark.createDataFrame([("never-seen-token-xyz",)], ["val"])
    got = _freqs(cms_lookup(sk, probes, F.col("val"), depth=4, width=65536))
    assert got == {"never-seen-token-xyz": 0}


def test_cms_plan_shape(spark):
    """Scale audit: the sketch build partial-aggregates before the wire
    (shuffle ≤ depth×width rows per partition) and the lookup
    BROADCASTS the sketch — the probe stream never shuffles on the
    counter key.  No Window, no SortMergeJoin anywhere."""
    df = _zipf_stream(spark)
    sk = cms_sketch(df, F.col("val"))
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "Window" not in plan, plan
    look = cms_lookup(sk, df, F.col("val"))
    lplan = look._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in lplan, lplan
    assert "SortMergeJoin" not in lplan, lplan
