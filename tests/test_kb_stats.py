"""Characteristic sets (ICDE'11) + VoID property partitions: profile
correctness on a handcrafted KB, star-cardinality exactness, and the
partial-aggregation plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.kb_stats import (
    characteristic_sets,
    star_cardinality,
    void_stats,
)

TRIPLES = [
    # two subjects with the {name, age} shape
    ("s1", "name", "alice"), ("s1", "age", "30"),
    ("s2", "name", "bob"), ("s2", "age", "31"),
    # one subject with {name, age, city}; multi-valued name
    ("s3", "name", "carol"), ("s3", "name", "caro"),
    ("s3", "age", "32"), ("s3", "city", "oslo"),
    # one name-only subject
    ("s4", "name", "dan"),
]


def _kb(spark):
    return spark.createDataFrame(TRIPLES, ["s", "p", "o"])


def test_characteristic_sets(spark):
    got = {
        r["cs"]: (r["n_subjects"], r["n_triples"])
        for r in characteristic_sets(_kb(spark)).collect()
    }
    assert got == {
        "age|name": (2, 4),
        "age|city|name": (1, 4),
        "name": (1, 1),
    }


def test_void_stats(spark):
    got = {
        r["p"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in void_stats(_kb(spark)).collect()
    }
    assert got == {
        "name": (5, 4, 5),
        "age": (3, 3, 3),
        "city": (1, 1, 1),
    }


def test_star_cardinality_is_exact(spark):
    """The profile-answered star count equals the directly-computed
    distinct-subject count for every predicate combination — the
    ICDE'11 exactness property the driver oracle also checks."""
    kb = _kb(spark)
    for star in (["name"], ["age"], ["name", "age"],
                 ["name", "city"], ["age", "city", "name"],
                 ["nope"], ["name", "nope"]):
        got = star_cardinality(kb, star).collect()[0]["n_subjects"]
        direct = (
            kb.where(F.col("p").isin(star)).groupBy("s")
            .agg(F.countDistinct("p").alias("k"))
            .where(F.col("k") == len(star)).count()
        )
        assert got == direct, star


def test_profile_plan_partial_aggregates(spark):
    """Both groupBys partial-aggregate before their exchange (the
    collect_set partials merge map-side), and nothing joins or sorts:
    the profile is two map-side-combined exchanges over a KB of any
    size."""
    plan = (
        characteristic_sets(_kb(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 4, plan


def test_profile_feeds_bgp_ordering(spark):
    """The collected VoID profile drives order_patterns: the rare
    predicate's seat leads the fold — profile → dict → ordering,
    end to end."""
    from rdf_n3_spark.operators.kb_stats import load_predicate_counts
    from rdf_n3_spark.plans.bgp import order_patterns

    counts = load_predicate_counts(void_stats(_kb(spark)))
    assert counts == {"name": 5, "age": 3, "city": 1}
    pats = [("?s", "name", "?n"), ("?s", "city", "?c"), ("?s", "age", "?a")]
    assert order_patterns(pats, counts) == [1, 2, 0]
