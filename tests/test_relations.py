"""Relation extraction: middle-token predicates, gap bound, support
and conversation-spread filters."""

from __future__ import annotations

from rdf_n3_spark.operators.relations import relation_candidates


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")


def test_relation_candidates_basics(spark):
    rows = [
        ("c1", 0, "part_a suppliedBy supp_x today"),
        ("c2", 0, "we think part_a suppliedBy supp_x"),
        ("c3", 0, "part_a maybe via supp_y"),          # support 1 → dropped
        ("c1", 1, "part_b w1 w2 w3 w4 supp_z"),        # gap 5 > max_gap → dropped
        ("c2", 1, "part_c supp_q adjacent mention"),   # empty predicate
        ("c3", 1, "part_c supp_q adjacent mention"),
    ]
    got = {
        (r["s_norm"], r["pred"], r["o_norm"]): (r["n_support"], r["n_convs"])
        for r in relation_candidates(_t(spark, rows)).collect()
    }
    assert got[("part_a", "suppliedby", "supp_x")] == (2, 2)
    assert got[("part_c", "", "supp_q")] == (2, 2)
    assert all(s != "part_b" for s, _, _ in got)
    assert all(o != "supp_y" for _, _, o in got)


def test_relation_candidates_ordered_and_turn_scoped(spark):
    """Pairs are position-ordered (subject precedes object) and never
    cross turn boundaries."""
    rows = [
        ("c1", 0, "supp_x makes part_a"),
        ("c2", 0, "supp_x makes part_a"),
        ("c1", 1, "part_a alone here"),
        ("c1", 2, "and supp_x alone"),
    ]
    got = {(r["s_norm"], r["pred"], r["o_norm"])
           for r in relation_candidates(_t(spark, rows)).collect()}
    assert got == {("supp_x", "makes", "part_a")}


def test_relation_plan_shape(spark):
    """Both joins are turn-keyed equi-joins (no cartesian), and the
    final support count partial-aggregates."""
    rows = [("c1", 0, "part_a suppliedBy supp_x")] * 2
    df = relation_candidates(_t(spark, [
        ("c%d" % i, 0, "part_a suppliedBy supp_x") for i in range(4)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 2, plan


def test_relation_triples_namespace_and_floors(spark):
    """Triples land in the mention pipeline's ent: namespace with
    underscored :rel_ predicates; the conversation-spread floor drops
    patterns confined to one conversation even at high support."""
    from rdf_n3_spark.operators.relations import relation_triples

    rows = (
        [("c1", i, "part_a suppliedBy supp_x") for i in range(5)]  # 1 conv only
        + [("c2", 0, "part_b madeBy supp_y"), ("c3", 0, "part_b madeBy supp_y")]
    )
    got = {(r["s"], r["p"], r["o"])
           for r in relation_triples(_t(spark, rows)).collect()}
    assert got == {("ent:part_b", ":rel_madeby", "ent:supp_y")}
