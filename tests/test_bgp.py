"""Distributed BGP matching + semi-naive rule fixpoint
(reference formula.rb BGP join, log/implies.rb, reasoner.rb think-loop)."""

from __future__ import annotations

import pytest

from rdf_n3_spark.plans.bgp import Rule, apply_rule, bgp, conclusions, fixpoint, match_pattern

T = [
    ("m1", ":refersTo", "e1"),
    ("m2", ":refersTo", "e1"),
    ("m3", ":refersTo", "e2"),
    ("e1", ":count", "2"),
    ("e2", ":count", "1"),
    ("x", ":loves", "x"),
    ("y", ":loves", "z"),
]


@pytest.fixture
def triples(spark):
    return spark.createDataFrame(T, "s string, p string, o string")


def test_match_pattern_constant_filter(triples):
    rows = match_pattern(triples, ("?m", ":refersTo", "e1")).collect()
    assert {r["m"] for r in rows} == {"m1", "m2"}


def test_match_pattern_repeated_var(triples):
    rows = match_pattern(triples, ("?a", ":loves", "?a")).collect()
    assert [r["a"] for r in rows] == ["x"]


def test_bgp_shared_var_join(triples):
    sol = bgp(triples, [("?m", ":refersTo", "?e"), ("?e", ":count", "?c")])
    got = {(r["m"], r["e"], r["c"]) for r in sol.collect()}
    assert got == {("m1", "e1", "2"), ("m2", "e1", "2"), ("m3", "e2", "1")}


def test_bgp_disjoint_cross_join(triples):
    sol = bgp(triples, [("?a", ":loves", "?a"), ("?e", ":count", "?c")])
    assert sol.count() == 2  # x × {e1, e2}


def test_apply_rule(triples):
    rule = Rule(
        antecedent=(("?m", ":refersTo", "?e"), ("?e", ":count", "?c")),
        consequent=(("?m", ":entFreq", "?c"),),
    )
    got = {tuple(r) for r in apply_rule(triples, rule).collect()}
    assert got == {
        ("m1", ":entFreq", "2"),
        ("m2", ":entFreq", "2"),
        ("m3", ":entFreq", "1"),
    }


def test_fixpoint_transitive_closure(spark):
    chain = [(f"n{i}", ":next", f"n{i+1}") for i in range(6)]
    df = spark.createDataFrame(chain, "s string, p string, o string")
    trans = Rule(
        antecedent=(("?a", ":next", "?b"), ("?b", ":next", "?c")),
        consequent=(("?a", ":next", "?c"),),
    )
    closed = fixpoint(df, [trans])
    pairs = {(r["s"], r["o"]) for r in closed.collect()}
    want = {(f"n{i}", f"n{j}") for i in range(6) for j in range(i + 1, 7)}
    assert pairs == want
    # inferred flag partitions base vs derived (reasoner conclusions)
    inf = {(r["s"], r["o"]) for r in conclusions(closed).collect()}
    assert inf == want - {(f"n{i}", f"n{i+1}") for i in range(6)}


def test_fixpoint_no_rules_fire(spark):
    df = spark.createDataFrame([("a", ":p", "b")], "s string, p string, o string")
    r = Rule(antecedent=(("?x", ":q", "?y"),), consequent=(("?x", ":r", "?y"),))
    closed = fixpoint(df, [r])
    assert closed.count() == 1
    assert conclusions(closed).count() == 0


def test_fixpoint_mutually_recursive_rules(spark):
    """Two rules feeding each other: a delta derived by rule A must be
    visible to rule B in the NEXT round (the semi-naive union of
    delta-seats is per rule, but the shared delta crosses rules) —
    the classic way a broken delta propagation under-derives.

    :e edges alternate through :odd/:even marks:
      odd(x) ∧ x :e y  ⇒ even(y)
      even(x) ∧ x :e y ⇒ odd(y)
    over a 6-node chain seeded with odd(n0): marks must reach n5.
    """
    from pyspark.sql import functions as F

    rows = [(f"n{i}", ":e", f"n{i + 1}") for i in range(5)]
    rows.append(("n0", ":is", "odd"))
    t = spark.createDataFrame(rows, "s string, p string, o string")
    odd_to_even = Rule(
        antecedent=(("?x", ":is", "odd"), ("?x", ":e", "?y")),
        consequent=(("?y", ":is", "even"),),
    )
    even_to_odd = Rule(
        antecedent=(("?x", ":is", "even"), ("?x", ":e", "?y")),
        consequent=(("?y", ":is", "odd"),),
    )
    closed = fixpoint(t, [odd_to_even, even_to_odd])
    marks = {(r["s"], r["o"]) for r in closed.where(F.col("p") == ":is").collect()}
    assert marks == {
        ("n0", "odd"), ("n1", "even"), ("n2", "odd"),
        ("n3", "even"), ("n4", "odd"), ("n5", "even"),
    }


def test_rule_engines_agree_on_closure(spark):
    """The driver Reasoner (per-document path) and the distributed
    semi-naive fixpoint (corpus path) must derive the SAME closure from
    the same facts and rule — the two-scales-one-semantics contract."""
    import random

    from rdf_n3_spark.functions.n3_parser import parse_n3
    from rdf_n3_spark.plans.reason import Reasoner

    rng = random.Random(7)
    edges = sorted({(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                    for _ in range(18)})
    n3 = ("@prefix : <http://ex/>.\n"
          "{ ?x :e ?y . ?y :e ?z } => { ?x :e ?z } .\n"
          + "\n".join(f":{a} :e :{b} ." for a, b in edges))
    r = Reasoner(parse_n3(n3)).execute(think=True)
    driver_closure = {
        (s.rsplit("/", 1)[-1].rstrip(">"), o.rsplit("/", 1)[-1].rstrip(">"))
        for s, p, o, g in r.kb if g == "" and p == "<http://ex/e>"
    }

    df = spark.createDataFrame([(a, ":e", b) for a, b in edges],
                               "s string, p string, o string")
    rule = Rule(antecedent=(("?x", ":e", "?y"), ("?y", ":e", "?z")),
                consequent=(("?x", ":e", "?z"),))
    dist_closure = {(row["s"], row["o"]) for row in
                    fixpoint(df, [rule]).select("s", "o").collect()}
    assert dist_closure == driver_closure


def test_fixpoint_per_graph_shares_pattern_seats(spark, monkeypatch):
    """VERDICT r2 item 9: identical (pattern, source) seats across
    rules must resolve to ONE match_pattern call per round — plan size
    grows with distinct patterns, not rules × patterns."""
    import rdf_n3_spark.plans.bgp as bgp_mod

    calls = []
    orig = bgp_mod.match_pattern

    def spy(src, pat, keep_graph=False):
        calls.append(pat)
        return orig(src, pat, keep_graph=keep_graph)

    monkeypatch.setattr(bgp_mod, "match_pattern", spy)
    quads = spark.createDataFrame(
        [("a", "<p>", "b", "g1"), ("b", "<q>", "c", "g1")],
        "s string, p string, o string, g string",
    )
    ante = (("?x", "<p>", "?y"), ("?y", "<q>", "?z"))
    rules = [Rule(antecedent=ante, consequent=((f"?x", f"<r{i}>", "?z"),))
             for i in range(3)]
    bgp_mod.fixpoint_per_graph(quads, rules, max_iter=1)
    # 3 rules × 2 seats × 2 patterns = 12 uncached; the memo collapses
    # them to the 4 distinct (pattern, total|delta) combinations
    assert len(calls) == 4, calls
