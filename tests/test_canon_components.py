"""Connected-components stress: deep chains and hub skew.

VERDICT r1 asked for evidence that the CC loop converges within
max_iter on a diameter ≫ 4 graph. With pointer-jumping the bound is
O(log diameter): a 60-node chain converges in well under 10 rounds
(plain neighbor propagation would need 60 and silently return
unconverged labels at max_iter=25).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.canon import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def test_deep_chain_converges_fast(spark):
    """60-node chain (diameter 59) — must fully converge within 10
    rounds, which only the pointer-jumped variant can do."""
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(59)]
    comp = connected_components(_edges(spark, chain), max_iter=10)
    rows = comp.collect()
    assert len(rows) == 60
    assert {r["comp"] for r in rows} == {"n000"}


def test_hub_component_and_skew(spark):
    """A 50-spoke hub (worst-case label fan-in) plus a disjoint chain:
    correct labels per component, no cross-contamination."""
    hub = [("hub", f"s{i:02d}") for i in range(50)]
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(20)]
    comp = connected_components(_edges(spark, hub + chain))
    by = {r["node"]: r["comp"] for r in comp.collect()}
    assert all(by[f"s{i:02d}"] == "hub" for i in range(50))
    assert by["hub"] == "hub"
    assert all(by[f"c{i:02d}"] == "c00" for i in range(21))


def test_two_chains_merge_via_bridge(spark):
    """Two chains joined by one bridge edge form one component whose
    label is the global min."""
    left = [(f"a{i}", f"a{i + 1}") for i in range(5)]
    right = [(f"z{i}", f"z{i + 1}") for i in range(5)]
    bridge = [("a5", "z0")]
    comp = connected_components(_edges(spark, left + right + bridge))
    assert {r["comp"] for r in comp.collect()} == {"a0"}


def test_one_action_per_round(spark, monkeypatch):
    """VERDICT r2 #8: the convergence check must not cost an extra
    Spark job — each round's single first() on the folded change-count
    both materializes the lazy-checkpointed labels and returns the
    convergence signal. Any count()/isEmpty() inside the loop is a
    regression to the two-action round."""
    # patch the CONCRETE class (pyspark 4 routes pyspark.sql.DataFrame
    # methods through classic.dataframe.DataFrame overrides)
    from pyspark.sql.classic.dataframe import DataFrame

    def boom(self, *a, **k):
        raise AssertionError("extra driver action inside the CC loop")

    firsts = []
    orig_first = DataFrame.first
    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "isEmpty", boom)
    monkeypatch.setattr(DataFrame, "first",
                        lambda self: (firsts.append(1), orig_first(self))[1])

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(9)]
    comp = connected_components(_edges(spark, chain), max_iter=10)
    monkeypatch.undo()
    by = {r["node"]: r["comp"] for r in comp.collect()}
    assert all(v == "n00" for v in by.values())
    # one first() per executed round, nothing else
    assert 1 <= len(firsts) <= 10


def test_pointer_jump_off_still_converges_shallow(spark):
    """The A/B knob: plain propagation (pointer_jump=False) must still
    fully converge on shallow graphs within max_iter."""
    hub = [("hub", f"s{i:02d}") for i in range(40)]
    comp = connected_components(_edges(spark, hub), max_iter=25,
                                pointer_jump=False)
    by = {r["node"]: r["comp"] for r in comp.collect()}
    assert all(v == "hub" for v in by.values())


def test_auto_jump_trips_on_deep_chain(spark):
    """auto mode must detect the stalled delta of a deep chain and
    converge within the same bound as always-jump (well under the
    diameter)."""
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(99)]
    comp = connected_components(_edges(spark, chain), max_iter=12,
                                pointer_jump="auto")
    by = {r["node"]: r["comp"] for r in comp.collect()}
    assert all(v == "n000" for v in by.values())
