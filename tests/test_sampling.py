"""Deterministic sampling / data-mixing operators (operators/sampling).

Semantics pinned on hand-built tables with known answers; the scale
shapes (zero-shuffle narrow maps, single shard-keyed exchange, tiny
post-aggregate window) are pinned as plan audits in the style of
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.sampling import (
    corpus_sample,
    shuffle_shards,
    source_mix,
    stratified_sample,
)


def _docs(spark, n=400):
    langs = ["en", "en", "en", "de", "zh"]          # en-heavy mix
    rows = [(i, f"w{i} w{i+1} " + "tok " * (i % 5), langs[i % 5],
             f"src{i % 3}") for i in range(n)]
    return spark.createDataFrame(
        [(i, t.strip(), l, s) for i, t, l, s in rows],
        "doc_id bigint, text string, lang string, source string")


# ---------------------------------------------------------------- corpus_sample

def test_corpus_sample_deterministic_and_monotone(spark):
    docs = _docs(spark)
    s5 = {r["doc_id"] for r in corpus_sample(docs, pct=5).collect()}
    s20 = {r["doc_id"] for r in corpus_sample(docs, pct=20).collect()}
    assert s5 == {r["doc_id"] for r in corpus_sample(docs, pct=5).collect()}
    assert s5 <= s20                      # growing pct only adds docs
    assert abs(len(s20) / 400 - 0.20) < 0.06
    assert {r["doc_id"] for r in
            corpus_sample(docs, pct=5, seed="sample-v2").collect()} != s5


def test_corpus_sample_is_narrow_map(spark):
    plan = (corpus_sample(_docs(spark, 8))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ------------------------------------------------------------ stratified_sample

def test_stratified_sample_honors_quotas(spark):
    docs = _docs(spark, 1000)
    got = stratified_sample(docs, {"en": 10, "zh": 80}, default_pct=0).collect()
    by = {}
    for r in got:
        by.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert "de" not in by                              # default 0 drops
    assert abs(len(by["en"]) / 600 - 0.10) < 0.05      # 600 en docs
    assert abs(len(by["zh"]) / 200 - 0.80) < 0.10      # 200 zh docs


def test_stratified_sample_strata_independent(spark):
    """The stratum-salted hash means one stratum's draw says nothing
    about another's: the same doc_id rank in two strata need not agree
    (regression guard against hashing doc_id alone)."""
    docs = _docs(spark, 1000)
    full = stratified_sample(docs, {}, default_pct=30)
    kept = {(r["stratum"], r["doc_id"]) for r in full.collect()}
    # if the hash ignored the stratum, keep-membership would be a pure
    # doc_id predicate; the en/zh doc_ids interleave (mod 5), so check
    # the kept doc_id sets differ in hash-bucket pattern across strata
    en_mod = {d % 5 for s, d in kept if s == "en"}
    assert en_mod == {0, 1, 2}                         # sanity: en ids
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan                      # still a narrow map


# --------------------------------------------------------------- shuffle_shards

def test_shuffle_shards_is_a_permutation(spark):
    docs = _docs(spark, 300)
    rows = shuffle_shards(docs, n_shards=4).collect()
    assert len(rows) == 300
    assert len({r["doc_id"] for r in rows}) == 300     # every doc once
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, poses in by_shard.items():
        assert sorted(poses) == list(range(len(poses)))  # dense 0..k-1


def test_shuffle_shards_order_uncorrelated_with_ids(spark):
    """The shuffled order must not resemble doc_id order: the first
    few positions of a shard are not the smallest doc_ids."""
    rows = shuffle_shards(_docs(spark, 300), n_shards=1).collect()
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])]
    assert order != sorted(order)
    # deterministic across recomputes
    again = shuffle_shards(_docs(spark, 300), n_shards=1).collect()
    assert {(r["doc_id"], r["pos"]) for r in again} == \
           {(r["doc_id"], r["pos"]) for r in rows}


def test_shuffle_shards_single_exchange_on_shard(spark):
    plan = (shuffle_shards(_docs(spark, 16), n_shards=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "shard" in plan.split("Exchange hashpartitioning")[1].splitlines()[0]


# ------------------------------------------------------------------- source_mix

def test_source_mix_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "en", "s0"), (2, "c d e", "en", "s0"),
         (3, "x", "de", "s1")],
        "doc_id bigint, text string, lang string, source string")
    got = {(r["source"], r["lang"]): r for r in source_mix(docs).collect()}
    r = got[("s0", "en")]
    assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (2, 5, 8)
    assert r["doc_share_ppm"] == 666666                # floor(2e6/3)
    assert r["token_share_ppm"] == 833333              # floor(5e6/6)
    r = got[("s1", "de")]
    assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (1, 1, 1)
    assert r["doc_share_ppm"] == 333333


def test_source_mix_window_runs_after_aggregate(spark):
    """The ppm window must sit above the groupBy output (tiny), not
    the corpus: the plan has the partial+final agg below the window."""
    plan = (source_mix(_docs(spark, 32))
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan or "partial" in plan.lower()
    assert plan.lower().index("window") < plan.lower().index("partial")


def test_source_weights_flatten_the_mix(spark):
    """α = 0.5 weights sit between the raw share and uniform: the rare
    source is up-weighted, the dominant one down-weighted, and the
    values replay a driver-side integer quantization exactly."""
    import math

    from rdf_n3_spark.operators.sampling import source_weights

    rows = ([(i, "x", "big") for i in range(900)]
            + [(1000 + i, "x", "rare") for i in range(9)])
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {r["source"]: (r["n_docs"], r["share_ppm"], r["weight_ppm"])
           for r in source_weights(docs).collect()}

    def replay(n, tot, sq_tot):
        sq = math.floor(math.sqrt(float(n)) * 1_000_000)
        return (n * 1_000_000 // tot, sq * 1_000_000 // sq_tot)

    sq_tot = sum(math.floor(math.sqrt(float(n)) * 1_000_000) for n in (900, 9))
    assert got["big"] == (900, *replay(900, 909, sq_tot))
    assert got["rare"] == (9, *replay(9, 909, sq_tot))
    # flattening: rare source's weight share strictly exceeds its doc
    # share; dominant source's is strictly below
    assert got["rare"][2] > got["rare"][1]
    assert got["big"][2] < got["big"][1]
    # still a distribution (ppm floor loses at most #sources parts)
    assert 1_000_000 - 2 <= got["big"][2] + got["rare"][2] <= 1_000_000


# ---------------------------------------------------------- token_budget_sample

def _budget_docs(spark, n=600):
    # src0 twice the docs of src1; src2 tiny — unequal token masses
    rows = []
    for i in range(n):
        src = "src0" if i % 4 < 2 else ("src1" if i % 4 == 2 else "src2")
        rows.append((i, "tok " * (5 + i % 7), src))
    return spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id bigint, text string, source string")


def test_token_budget_targets_met_minimally(spark):
    from rdf_n3_spark.operators.sampling import (
        source_weights, token_budget_sample,
    )

    docs = _budget_docs(spark)
    budget = 1500
    out = token_budget_sample(docs, budget, buckets=64).collect()
    w = {r["source"]: r["weight_ppm"]
         for r in source_weights(docs).collect()}
    totals, kept = {}, {}
    for r in out:
        totals[r["source"]] = totals.get(r["source"], 0) + r["n_tokens"]
        if r["keep"]:
            kept[r["source"]] = kept.get(r["source"], 0) + r["n_tokens"]
    for src, ppm in w.items():
        target = budget * ppm // 1_000_000
        if totals[src] >= target > 0:
            assert kept.get(src, 0) >= target, src
            # minimality: the threshold bucket is load-bearing — verify
            # by rerunning with the kept set's largest bucket excluded
            # via a smaller budget probe below (monotonicity test)


def test_token_budget_small_source_keeps_everything(spark):
    from rdf_n3_spark.operators.sampling import token_budget_sample

    docs = _budget_docs(spark)
    # budget far above the corpus: every source undershoots its target
    out = token_budget_sample(docs, 10**9, buckets=64).collect()
    assert all(r["keep"] == 1 for r in out)


def test_token_budget_zero_budget_keeps_nothing(spark):
    from rdf_n3_spark.operators.sampling import token_budget_sample

    docs = _budget_docs(spark)
    out = token_budget_sample(docs, 0, buckets=64).collect()
    assert out and all(r["keep"] == 0 for r in out)


def test_token_budget_monotone_in_budget(spark):
    from rdf_n3_spark.operators.sampling import token_budget_sample

    docs = _budget_docs(spark)
    keep = {}
    for budget in (500, 1500, 4000):
        keep[budget] = {r["doc_id"] for r in
                        token_budget_sample(docs, budget, buckets=64)
                        .collect() if r["keep"]}
    assert keep[500] <= keep[1500] <= keep[4000]


def test_token_budget_partition_independent(spark):
    from rdf_n3_spark.operators.sampling import token_budget_sample

    docs = _budget_docs(spark)
    a = sorted(map(tuple, token_budget_sample(docs, 1500).collect()))
    b = sorted(map(tuple,
                   token_budget_sample(docs.repartition(13), 1500).collect()))
    assert a == b


def test_token_budget_absent_source_is_dropped(spark):
    from rdf_n3_spark.operators.sampling import token_budget_sample

    docs = _budget_docs(spark)
    w = spark.createDataFrame(
        [("src0", 700000), ("src1", 300000)],
        "source string, weight_ppm bigint")
    out = token_budget_sample(docs, 1500, weights=w).collect()
    assert {r["source"] for r in out} == {"src0", "src1"}


def test_token_budget_plan_broadcasts_thresholds(spark):
    """The corpus-sized branch pays ONE aggregate exchange; the
    threshold table comes back as a broadcast — no corpus-keyed
    sort-merge join, no corpus-sized window."""
    from rdf_n3_spark.operators.sampling import token_budget_sample

    plan = (token_budget_sample(_budget_docs(spark, 40), 500)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
