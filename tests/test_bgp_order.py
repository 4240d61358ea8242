"""BGP join ordering: connectivity-first greedy fold — same solution
set in every order, cross joins only for genuinely disconnected BGPs,
statistics refine ties."""

from __future__ import annotations

import pytest

from rdf_n3_spark.plans.bgp import bgp, order_patterns

TRIPLES = [
    ("a1", "P", "b1"), ("a2", "P", "b2"),
    ("b1", "R", "c1"), ("b2", "R", "c2"),
    ("c1", "Q", "d1"),
    ("x", "T", "y"),
]

# author order puts the disjoint (?c Q ?d) second: the naive fold
# would cross-join it against (?a P ?b) before (?b R ?c) connects them
CHAIN = [("?a", "P", "?b"), ("?c", "Q", "?d"), ("?b", "R", "?c")]


def _store(spark):
    return spark.createDataFrame(TRIPLES, ["s", "p", "o"])


def _rows(df):
    return {tuple(sorted(r.asDict().items())) for r in df.collect()}


def test_order_connectivity_beats_author_order():
    order = order_patterns(CHAIN)
    # 0 and 1 tie on var count; 0 wins by index. 1 (disjoint from 0)
    # must be deferred behind 2, which connects via ?b.
    assert order == [0, 2, 1]


def test_any_order_same_solutions(spark):
    """Join reordering is semantics-preserving: the ordered fold equals
    a fold over every permutation of the pattern list."""
    import itertools

    store = _store(spark)
    want = _rows(bgp(store, CHAIN))
    assert want == {tuple(sorted({"a": "a1", "b": "b1", "c": "c1",
                                  "d": "d1"}.items()))}
    for perm in itertools.permutations(CHAIN):
        assert _rows(bgp(store, list(perm))) == want, perm


def test_connected_bgp_has_no_cartesian(spark):
    plan = (
        bgp(_store(spark), CHAIN)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_disconnected_bgp_still_products(spark):
    """A genuinely disconnected BGP is a product by SPARQL/N3
    semantics — the ordering must not drop it."""
    sols = bgp(_store(spark), [("?a", "P", "?b"), ("?x", "T", "?y")])
    assert sols.count() == 2  # 2 P-rows × 1 T-row


def test_stats_refine_ties():
    """With a predicate-count profile, the rarer predicate's pattern
    leads among equally-shaped seats."""
    pats = [("?a", "P", "?b"), ("?a", "Q", "?c")]
    assert order_patterns(pats, {"P": 1_000_000, "Q": 5}) == [1, 0]
    assert order_patterns(pats, {"P": 5, "Q": 1_000_000}) == [0, 1]
    # no profile → author order for equal shapes
    assert order_patterns(pats) == [0, 1]


def test_ground_pattern_leads():
    pats = [("?a", "P", "?b"), ("s0", "P", "o0"), ("?b", "R", "s0")]
    order = order_patterns(pats)
    assert order[0] == 1  # fully ground seat filters hardest
    # a ground seat binds no variables, so the next pick is again
    # global: the 1-var seat (2) beats the 2-var seat (0)
    assert order == [1, 2, 0]


def test_sources_stay_aligned(spark):
    """Per-seat source override (the semi-naive delta machinery) must
    permute WITH its pattern."""
    store = _store(spark)
    empty = store.limit(0)
    # Q-seat reads an EMPTY delta: if sources misaligned after
    # reordering, some other seat would go empty instead and the
    # solution set would differ from the semantic expectation (∅).
    sols = bgp(store, CHAIN, sources=[store, empty, store])
    assert sols.count() == 0
    sols2 = bgp(store, CHAIN, sources=[store, store, store])
    assert sols2.count() == 1


def test_order_patterns_properties():
    """Property sweep (pure driver-side): for random BGPs the ordering
    is a permutation, and every non-first pick shares a variable with
    the already-bound set whenever ANY remaining pattern does (cross
    joins only when semantically unavoidable)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    term = st.one_of(
        st.sampled_from(["?a", "?b", "?c", "?d", "?e"]),
        st.sampled_from(["s0", "s1", "P", "Q", "o0"]),
    )
    pattern = st.tuples(term, term, term)
    bgps = st.lists(pattern, min_size=1, max_size=6)

    @settings(max_examples=300, deadline=None)
    @given(bgps)
    def check(pats):
        order = order_patterns(pats)
        assert sorted(order) == list(range(len(pats)))
        bound: set = set()
        rest = set(range(len(pats)))

        def vs(i):
            return {t for t in pats[i] if t.startswith("?")}

        for i in order:
            connectable = [j for j in rest if vs(j) & bound]
            if bound and connectable:
                assert i in connectable, (pats, order)
            rest.remove(i)
            bound |= vs(i)

    check()


def test_char_sets_beat_misleading_counts():
    """VERDICT r4 item 5: a star of two individually-frequent but
    jointly-rare predicates must order correctly.  Solo VoID counts say
    Q (10 triples) before R (1000 triples); the characteristic-set
    profile knows the JOINT star {P,R} matches 4 subjects while {P,Q}
    matches 502 — so with star_cards, R's seat joins second."""
    pats = [("?s", "P", "?a"), ("?s", "Q", "?b"), ("?s", "R", "?c")]
    counts = {"P": 1, "Q": 10, "R": 1000}
    cs = [
        (frozenset({"P", "Q"}), 500),
        (frozenset({"P", "Q", "R"}), 2),
        (frozenset({"P", "R"}), 2),
    ]
    # counts alone mislead: Q's low solo count wins the second seat
    assert order_patterns(pats, counts) == [0, 1, 2]
    # the cs profile prices the joint stars exactly: R second
    assert order_patterns(pats, counts, star_cards=cs) == [0, 2, 1]


def test_char_sets_order_preserves_solutions(spark):
    """cs-refined ordering is still just a permutation: the solution
    set equals the statistics-free fold on real data."""
    rows = (
        [(f"a{i}", "P", "x") for i in range(6)]
        + [(f"a{i}", "Q", "y") for i in range(5)]   # {P,Q} star common
        + [("a0", "R", "z")]                          # {P,Q,R} star rare
    )
    store = spark.createDataFrame(rows, ["s", "p", "o"])
    pats = [("?s", "P", "?a"), ("?s", "Q", "?b"), ("?s", "R", "?c")]
    from rdf_n3_spark.operators.kb_stats import (
        characteristic_sets,
        load_char_sets,
        load_predicate_counts,
        void_stats,
    )

    counts = load_predicate_counts(void_stats(store))
    cards = load_char_sets(characteristic_sets(store))
    want = _rows(bgp(store, pats))
    assert want == {tuple(sorted({"s": "a0", "a": "x", "b": "y",
                                  "c": "z"}.items()))}
    assert _rows(bgp(store, pats, predicate_counts=counts,
                     star_cards=cards)) == want
