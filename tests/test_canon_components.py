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
