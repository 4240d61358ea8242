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


# ----------------------------------------------------------- bloom

def _bloom_corpus(spark):
    return spark.createDataFrame(
        [(f"tok{i}",) for i in range(300)], ["v"])


def test_bloom_no_false_negatives(spark):
    """The one-sided contract: every ingested value probes 1."""
    from rdf_n3_spark.operators.sketch import bloom_probe, bloom_sketch

    corpus = _bloom_corpus(spark)
    filt = bloom_sketch(corpus, F.col("v"))
    got = bloom_probe(filt, corpus, F.col("v")).collect()
    assert len(got) == 300
    assert all(r["maybe_present"] == 1 for r in got)


def test_bloom_fpr_is_bounded_and_zero_is_definitive(spark):
    """Absent values probe 0 except for a bounded false-positive rate
    (theory at n=300, m=8192, k=3: ≈ (1-e^(-3·300/8192))^3 ≈ 0.1%;
    assert a generous 5% ceiling), and any 0 is truly absent."""
    from rdf_n3_spark.operators.sketch import bloom_probe, bloom_sketch

    filt = bloom_sketch(_bloom_corpus(spark), F.col("v"))
    absent = spark.createDataFrame(
        [(f"other{i}",) for i in range(400)], ["v"])
    got = bloom_probe(filt, absent, F.col("v")).collect()
    fpr = sum(r["maybe_present"] for r in got) / len(got)
    assert fpr <= 0.05, f"false-positive rate {fpr:.3f} above ceiling"


def test_bloom_merge_is_exact(spark):
    """bit_or of shard filters equals the filter of the unioned data
    row-for-row — the daily→monthly rollup property, with zero
    approximation in the fold."""
    from rdf_n3_spark.operators.sketch import bloom_merge, bloom_sketch

    corpus = _bloom_corpus(spark)
    a = corpus.where(F.col("v") < "tok2")
    b = corpus.where(F.col("v") >= "tok2")
    merged = {(r["word"], r["bits"])
              for r in bloom_merge(bloom_sketch(a, F.col("v")),
                                   bloom_sketch(b, F.col("v"))).collect()}
    whole = {(r["word"], r["bits"])
             for r in bloom_sketch(corpus, F.col("v")).collect()}
    assert merged == whole and len(whole) > 0


def test_bloom_partitioning_independence(spark):
    """The sketch table is identical under any input partitioning
    (bit_or is commutative/associative)."""
    from rdf_n3_spark.operators.sketch import bloom_sketch

    corpus = _bloom_corpus(spark)
    one = {(r["word"], r["bits"])
           for r in bloom_sketch(corpus.coalesce(1), F.col("v")).collect()}
    many = {(r["word"], r["bits"])
            for r in bloom_sketch(corpus.repartition(13), F.col("v")).collect()}
    assert one == many


def test_bloom_plan_shape(spark):
    """Build = one map-side-combinable bit_or groupBy (no window, no
    join); probe broadcasts the filter (no shuffled join on the word
    key)."""
    from rdf_n3_spark.operators.sketch import bloom_probe, bloom_sketch

    corpus = _bloom_corpus(spark)
    build = bloom_sketch(corpus, F.col("v"))
    p = build._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p and "Join" not in p, p
    probe = bloom_probe(build, corpus, F.col("v"))
    pp = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pp, pp
    assert "SortMergeJoin" not in pp, pp


def test_bloom_decontaminate_is_conservative_superset(spark):
    """vs the exact broadcast-set decontaminate: every truly
    contaminated doc is flagged (no false negatives), extra flags are
    bounded by the filter's fpr; at a generously-sized filter the two
    verdicts coincide on this corpus."""
    from rdf_n3_spark.operators.curation import decontaminate
    from rdf_n3_spark.operators.sketch import bloom_decontaminate
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 20 == 7)
    corpus = docs.where(F.col("doc_id") % 20 != 7)
    exact = {r["doc_id"] for r in decontaminate(corpus, bench, n=4)
             .where("contaminated").collect()}
    flagged = {r["doc_id"]
               for r in bloom_decontaminate(corpus, bench, n=4,
                                            m_bits=1 << 18)
               .where("contaminated").collect()}
    assert exact <= flagged, "bloom must never miss a contaminated doc"
    extra = len(flagged - exact) / max(len(flagged), 1)
    assert extra <= 0.05, f"over-flagging {extra:.3f} above fpr budget"


# ------------------------------------------------- MG heavy hitters

def _zipf_rows():
    rows = []
    for r in range(1, 41):                     # 40 values, zipf-ish
        rows += [(f"val{r:02d}",)] * (800 // r)
    return rows


def test_mg_topk_equals_exact_under_any_partitioning(spark):
    """The MG candidate prune is invisible in the result: exact top-k
    with the (n desc, v asc) tiebreak, identical at 1 and 13 input
    partitions."""
    from rdf_n3_spark.operators.sketch import mg_topk

    df = spark.createDataFrame(_zipf_rows(), ["v"])
    want = [
        (r["v"], r["n"]) for r in
        df.groupBy("v").count().withColumnRenamed("count", "n")
        .orderBy(F.col("n").desc(), "v").limit(10).collect()
    ]
    for parts in (1, 13):
        got = [(r["v"], r["n"]) for r in
               mg_topk(df.repartition(parts), F.col("v"), k=10)
               .orderBy("rank").collect()]
        assert got == want, parts


def test_mg_survival_guarantee_with_tiny_summary(spark):
    """Adversarial spread: a value whose global frequency clears
    N/(counters+1) but is spread evenly across partitions must survive
    the key-union (the averaging argument), even at counters = 8."""
    from rdf_n3_spark.operators.sketch import mg_topk

    # 26 distinct light values × 40 + heavy × 200 → heavy is 200 of
    # 1240 rows; counters=8 floor is 1240/9 ≈ 138 < 200
    rows = [(f"light{i:02d}",) for i in range(26)] * 40 + [("heavy",)] * 200
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    top = mg_topk(df, F.col("v"), k=1, counters=8).collect()
    assert top[0]["v"] == "heavy" and top[0]["n"] == 200


def test_mg_topk_plan_shape(spark):
    """Candidates broadcast back as a semi-join filter (no shuffled
    join of the value stream) and nothing cartesian appears; the rank
    window's input is the candidate count table."""
    from rdf_n3_spark.operators.sketch import token_heavy_hitters
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = token_heavy_hitters(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    rows = out.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
