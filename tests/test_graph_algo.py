"""Quantized PageRank: exact-integer update rule pinned on a
hand-computed graph, dangling/no-in-edge behavior, duplicate-edge
idempotence, and partitioning-independence (the property the integer
quantization exists to guarantee).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.graph_algo import pagerank_quantized

BASE = 150_000_000
S = 1_000_000_000


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _hand_pagerank(edge_list, iters):
    nodes = sorted({n for e in edge_list for n in e})
    edges = sorted(set(edge_list))
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    rank = {n: S for n in nodes}
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // outd[s]
        rank = {n: BASE + (85 * contrib[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_hand_computation(spark):
    el = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    got = {r["node_id"]: r["rank_ppb"]
           for r in pagerank_quantized(_edges(spark, el), iterations=3).collect()}
    assert got == _hand_pagerank(el, 3)


def test_pagerank_sink_gets_base_only_and_dup_edges_collapse(spark):
    # b is a sink (dangling): its mass leaks, but it still RECEIVES.
    # a has no in-edges: after one round it holds exactly the base.
    el = [("a", "b"), ("a", "b"), ("a", "b")]  # dup edges = one edge
    got = {r["node_id"]: r["rank_ppb"]
           for r in pagerank_quantized(_edges(spark, el), iterations=1).collect()}
    assert got["a"] == BASE
    assert got["b"] == BASE + (85 * (S // 1)) // 100


def test_pagerank_setup_single_edge_exchange(spark):
    """One repartition("src") funds the whole setup: the (src, dst)
    distinct, the out-degree groupBy(src), the src join, and the
    src-side node distinct all reuse the checkpointed partitioning —
    zero further Exchange nodes.  Scope: AQE off (the bench / batch-job
    config); under AQE the checkpoint degrades to UnknownPartitioning
    and ENSURE_REQUIREMENTS re-exchanges, which is correct but not the
    shape this pins.  Mirrors graph_algo.pagerank_quantized's setup."""
    conf = spark.conf
    saved = {k: conf.get(k) for k in
             ("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")}
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = _edges(spark, [(f"n{i}", f"n{(i * 7) % 23}") for i in range(60)])

        def plan(df):
            return df._jdf.queryExecution().executedPlan().toString()

        e_lazy = edges.select("src", "dst").repartition("src").distinct()
        assert plan(e_lazy).count("Exchange") == 1, plan(e_lazy)
        e = e_lazy.localCheckpoint()
        outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        assert plan(outd).count("Exchange") == 0, plan(outd)
        e2 = e.join(outd, "src")
        assert plan(e2).count("Exchange") == 0, plan(e2)
        nsrc = e.select(F.col("src").alias("node")).distinct()
        assert plan(nsrc).count("Exchange") == 0, plan(nsrc)
        # the per-iteration join is exchange-free on BOTH sides: the
        # checkpointed e2 carries src-hash partitioning and the
        # checkpointed rank table carries node-hash partitioning (the
        # alias rides the partitioning), so each round shuffles only
        # the contribution groupBy(dst)
        e2c = e2.localCheckpoint()
        ranks = e.select(F.col("src").alias("node")).distinct().localCheckpoint()
        it = e2c.join(ranks, e2c["src"] == ranks["node"])
        p = plan(it)
        assert p.count("Exchange") == 0, p
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_pagerank_aqe_session(spark, monkeypatch):
    """AQE-on session (the spark-submit batch-job default): the
    operator pins AQE off for its internal actions — so the
    single-exchange setup shape of the test above holds for EVERY
    caller, not just AQE-off benches — and restores the caller's
    setting afterward, with results identical to the AQE-off run."""
    import rdf_n3_spark.operators.graph_algo as ga

    el = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    captured = {}
    orig = ga._pagerank_pinned

    def spy(edges, iterations, scale):
        captured["aqe_inside"] = spark.conf.get("spark.sql.adaptive.enabled")
        return orig(edges, iterations, scale)

    monkeypatch.setattr(ga, "_pagerank_pinned", spy)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        got = {r["node_id"]: r["rank_ppb"]
               for r in pagerank_quantized(_edges(spark, el),
                                           iterations=3).collect()}
        # pinned off while the internal eager checkpoints executed…
        assert captured["aqe_inside"] == "false"
        # …restored for the caller before the function returned
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert got == _hand_pagerank(el, 3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_pagerank_is_partitioning_independent(spark):
    el = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(60)]
    df = _edges(spark, el)
    r1 = pagerank_quantized(df.repartition(1), iterations=3)
    r32 = pagerank_quantized(df.repartition(32), iterations=3)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r32.collect()))


# ----------------------------------------------------------- co-occurrence

def test_cooccurrence_edges_weights_and_canonical_order(spark):
    from rdf_n3_spark.operators.graph_algo import cooccurrence_edges

    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "a"), ("g1", "a"),   # dup membership ignored
         ("g2", "a"), ("g2", "b"), ("g3", "a"), ("g3", "c")],
        "grp string, ent string",
    )
    rows = {(r["u"], r["v"]): r["weight"]
            for r in cooccurrence_edges(df, "grp", "ent").collect()}
    assert rows == {("a", "b"): 2, ("a", "c"): 1}


# --------------------------------------------------------------- triangles

def _tri_edges(spark, pairs):
    return spark.createDataFrame(pairs, "u string, v string")


def test_triangle_counts_k4(spark):
    from rdf_n3_spark.operators.graph_algo import triangle_counts

    # K4: every node is in C(3,2)=3 triangles
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    rows = {r["node"]: r["n_triangles"]
            for r in triangle_counts(_tri_edges(spark, pairs)).collect()}
    assert rows == {n: 3 for n in nodes}


def test_triangle_counts_open_wedge_is_not_a_triangle(spark):
    from rdf_n3_spark.operators.graph_algo import triangle_counts

    rows = triangle_counts(
        _tri_edges(spark, [("a", "b"), ("b", "c")])).collect()
    assert rows == []


def test_triangle_counts_hub_fan(spark):
    from rdf_n3_spark.operators.graph_algo import triangle_counts

    # hub h connected to s0..s9 in a fan; consecutive spokes also
    # linked → 9 triangles, each spoke in ≤2, hub in all 9
    pairs = [tuple(sorted(("h", f"s{i}"))) for i in range(10)]
    pairs += [tuple(sorted((f"s{i}", f"s{i+1}"))) for i in range(9)]
    rows = {r["node"]: r["n_triangles"]
            for r in triangle_counts(_tri_edges(spark, pairs)).collect()}
    assert rows["h"] == 9
    assert rows["s0"] == 1 and rows["s5"] == 2
    assert sum(rows.values()) == 27  # 9 triangles x 3 corners


def test_triangle_degree_cap_matches_exact_below_cap(spark):
    """max_degree higher than every node's degree = the exact count."""
    from rdf_n3_spark.operators.graph_algo import triangle_counts

    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    exact = sorted(map(tuple, triangle_counts(
        _tri_edges(spark, pairs)).collect()))
    capped = sorted(map(tuple, triangle_counts(
        _tri_edges(spark, pairs), max_degree=10).collect()))
    assert capped == exact


def test_triangle_degree_cap_excludes_celebrity_subgraph_exactly(spark):
    """Capped counts equal the exact counts of the graph with the
    celebrity REMOVED — the subgraph semantics the docstring promises
    (hub h: degree 10 > cap; spokes keep their spoke-spoke triangles)."""
    from rdf_n3_spark.operators.graph_algo import triangle_counts

    hub = [tuple(sorted(("h", f"s{i}"))) for i in range(10)]
    ring = [tuple(sorted((f"s{i}", f"s{(i + 1) % 10}"))) for i in range(10)]
    chords = [tuple(sorted((f"s{i}", f"s{(i + 2) % 10}"))) for i in range(10)]
    capped = sorted(map(tuple, triangle_counts(
        _tri_edges(spark, hub + ring + chords), max_degree=6).collect()))
    no_hub = sorted(map(tuple, triangle_counts(
        _tri_edges(spark, ring + chords)).collect()))
    assert capped == no_hub
    assert not any(n == "h" for n, _ in capped)


def test_kcore_clique_survives_chain_peels(spark):
    """4-clique (all degrees 3) survives k=3; an attached chain peels
    away — including the attachment point once its chain neighbor
    goes, which needs the multi-round cascade."""
    from rdf_n3_spark.operators.graph_algo import kcore_fixed

    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(clique + chain, ["u", "v"])
    rows = {r["node"]: r["in_core"] for r in kcore_fixed(edges, k=3).collect()}
    assert {n for n, c in rows.items() if c == 1} == {"a", "b", "c", "d"}
    assert {n for n, c in rows.items() if c == 0} == {"e", "f"}


def test_kcore_rounds_bound_the_cascade(spark):
    """A long pendant path needs one round per hop: rounds=1 only
    strips the leaf-adjacent layer, rounds=4 finishes the peel."""
    from rdf_n3_spark.operators.graph_algo import kcore_fixed

    # path p0-p1-p2-p3-p4 attached to a 3-clique won't work for k=3
    # (path degrees are 2 < 3, all peel in round 1); use k=2 instead
    path = [(f"p{i}", f"p{i+1}") for i in range(5)]
    square = [("x", "y"), ("y", "z"), ("z", "w"), ("w", "x"), ("x", "p0")]
    edges = spark.createDataFrame(path + square, ["u", "v"])
    r1 = {r["node"]: r["in_core"]
          for r in kcore_fixed(edges, k=2, rounds=1).collect()}
    r7 = {r["node"]: r["in_core"]
          for r in kcore_fixed(edges, k=2, rounds=7).collect()}
    assert r1["p5"] == 0 and r1["p3"] == 1   # only the leaf end stripped
    assert all(r7[f"p{i}"] == 0 for i in range(6))  # full cascade (6 hops)
    assert all(r7[n] == 1 for n in "xyzw")   # the cycle is the 2-core


# ------------------------------------------------------- khop_neighbors


def _khop(spark, edges, seeds, k=2):
    from rdf_n3_spark.operators.graph_algo import khop_neighbors

    e = spark.createDataFrame(edges, ["u", "v"])
    s = spark.createDataFrame([(x,) for x in seeds], ["seed"])
    return {
        (r["seed"], r["node"]): r["dist"]
        for r in khop_neighbors(e, s, k=k).collect()
    }


def test_khop_path_graph_levels_and_bound(spark):
    got = _khop(spark, [("a", "b"), ("b", "c"), ("c", "d")], ["a"], k=2)
    assert got == {("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2}


def test_khop_min_distance_on_diamond(spark):
    """y reachable at hop 1 directly and hop 2 via x: BFS level order
    must report dist 1, and the seed must not re-enter at dist 2."""
    got = _khop(spark, [("s", "x"), ("x", "y"), ("s", "y")], ["s"], k=2)
    assert got == {("s", "s"): 0, ("s", "x"): 1, ("s", "y"): 1}


def test_khop_multi_seed_independent_and_missing_seed(spark):
    got = _khop(spark, [("a", "b"), ("c", "d")], ["a", "zz"], k=2)
    assert got == {
        ("a", "a"): 0, ("a", "b"): 1,
        ("zz", "zz"): 0,  # absent seed: dist-0 row only, no expansion
    }


def test_khop_single_edge_exchange_for_all_hops(spark):
    """The symmetric edge list is repartitioned (and checkpointed) once;
    each hop's frontier join reuses that layout, so the checkpointed
    scan must carry the hop joins without a fresh edge-side Exchange
    per hop (frontier-side exchanges are frontier-sized, not
    edge-sized)."""
    from rdf_n3_spark.operators.graph_algo import khop_neighbors

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["u", "v"])
    s = spark.createDataFrame([("a",)], ["seed"])
    out = khop_neighbors(e, s, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the final union reads checkpointed per-hop results; no raw
    # cartesian anywhere
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------- LPA

def _wedges(spark, rows):
    return spark.createDataFrame(rows, "u string, v string, weight bigint")


def test_lpa_separates_cliques_cc_would_merge(spark):
    """Two 4-cliques joined by ONE weak bridge: min-label CC collapses
    everything to one component, but the majority vote never lets the
    bridge outvote a node's three in-clique neighbors — the community
    lens LPA exists to add."""
    from rdf_n3_spark.operators.graph_algo import lpa_communities

    def clique(names):
        return [(a, b, 1) for a in names for b in names if a < b]

    left, right = ["a1", "a2", "a3", "a4"], ["b1", "b2", "b3", "b4"]
    el = clique(left) + clique(right) + [("a1", "b1", 1)]
    got = {r["node"]: r["community"]
           for r in lpa_communities(_wedges(spark, el), rounds=2).collect()}
    assert len({got[n] for n in left}) == 1
    assert len({got[n] for n in right}) == 1
    assert got["a2"] != got["b2"]


def test_lpa_weighted_vote_and_tie_order(spark):
    """Hand-computed 1 round on a star: center 'c' hears x(w=5) vs
    y(w=2)+z(w=2) — label x wins on weight; leaves each hear only c.
    Round-1 check pins BOTH the weighting and the sync semantics."""
    from rdf_n3_spark.operators.graph_algo import lpa_communities

    el = [("c", "x", 5), ("c", "y", 2), ("c", "z", 2)]
    got = {r["node"]: r["community"]
           for r in lpa_communities(_wedges(spark, el), rounds=1).collect()}
    assert got == {"c": "x", "x": "c", "y": "c", "z": "c"}
    # tie case: equal weights -> lexically smallest label wins
    el2 = [("c", "x", 3), ("c", "y", 3)]
    got2 = {r["node"]: r["community"]
            for r in lpa_communities(_wedges(spark, el2), rounds=1).collect()}
    assert got2["c"] == "x"


def test_lpa_partitioning_independent(spark):
    """Same labels from 1-partition and 16-partition inputs — the
    deterministic total tie order is what buys this."""
    from rdf_n3_spark.operators.graph_algo import lpa_communities

    el = [(f"n{i}", f"n{(i * 7) % 40}", 1 + i % 3)
          for i in range(40) if i != (i * 7) % 40]
    df = _wedges(spark, el)
    a = sorted(map(tuple, lpa_communities(df.coalesce(1), rounds=2).collect()))
    b = sorted(map(tuple, lpa_communities(df.repartition(16), rounds=2).collect()))
    assert a == b and len(a) > 0


# ----------------------------------------------------------- link prediction

def test_linkpred_path_graph(spark):
    from rdf_n3_spark.operators.graph_algo import linkpred_scores

    # path a-b-c-d: (a,c) share b, (b,d) share c; adjacent pairs and
    # (a,d) (no common neighbor) must NOT appear
    e = _tri_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {(r["u"], r["v"]): r.asDict()
           for r in linkpred_scores(e).collect()}
    assert set(got) == {("a", "c"), ("b", "d")}
    assert got[("a", "c")]["n_common"] == 1
    assert got[("a", "c")]["deg_u"] == 1 and got[("a", "c")]["deg_v"] == 2


def test_linkpred_excludes_existing_edges(spark):
    from rdf_n3_spark.operators.graph_algo import linkpred_scores

    # triangle a-b-c plus pendant d on a: (b,c) share a but ARE linked
    e = _tri_edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")])
    got = {(r["u"], r["v"]) for r in linkpred_scores(e).collect()}
    assert ("b", "c") not in got
    # (b,d) and (c,d) share a and are unlinked
    assert got == {("b", "d"), ("c", "d")}


def test_linkpred_min_common_floor(spark):
    from rdf_n3_spark.operators.graph_algo import linkpred_scores

    # x,y share two mids (m1, m2) — and symmetrically m1,m2 share
    # x,y; x,z share only m1, so the floor=2 drops (x,z) and (y,z)
    e = _tri_edges(spark, [
        ("m1", "x"), ("m1", "y"), ("m2", "x"), ("m2", "y"), ("m1", "z"),
    ])
    got = {(r["u"], r["v"]): r["n_common"]
           for r in linkpred_scores(e, min_common=2).collect()}
    assert got == {("x", "y"): 2, ("m1", "m2"): 2}


def test_linkpred_degree_cap_drops_hub_evidence_only(spark):
    from rdf_n3_spark.operators.graph_algo import linkpred_scores

    # hub h connects x,y,z (degree 3); m connects x,y (degree 2).
    # cap=2 removes h as a MID: (x,z)/(y,z) vanish and (x,y) keeps
    # only the m-wedge — but h remains a scored ENDPOINT ((h,m)
    # share x and y through degree-2 mids) and endpoint degrees
    # stay full-graph.
    e = _tri_edges(spark, [
        ("h", "x"), ("h", "y"), ("h", "z"), ("m", "x"), ("m", "y"),
    ])
    full = {(r["u"], r["v"]): r["n_common"]
            for r in linkpred_scores(e).collect()}
    assert full[("x", "y")] == 2 and full[("x", "z")] == 1
    capped = {(r["u"], r["v"]): r.asDict()
              for r in linkpred_scores(e, max_degree=2).collect()}
    assert set(capped) == {("x", "y"), ("h", "m")}
    assert capped[("x", "y")]["n_common"] == 1
    assert capped[("x", "y")]["deg_u"] == 2  # full-graph degree kept
    assert capped[("h", "m")]["n_common"] == 2
    assert capped[("h", "m")]["deg_u"] == 3  # hub degree reported


def _walk_edges(spark, pairs):
    return spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "u string, v string, weight long")


def test_random_walks_deterministic_and_well_formed(spark):
    """Walks are pure functions of the input: same edges ⇒ identical
    row set, every step-i node is a real neighbor of the step-(i-1)
    node, step 0 is the start node."""
    from rdf_n3_spark.operators.graph_algo import random_walks

    e = _walk_edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                            ("c", "d")])
    w1 = random_walks(e, walks_per_node=2, length=3)
    rows = {(r["start"], r["walk_id"], r["step"]): r["node"]
            for r in w1.collect()}
    rows2 = {(r["start"], r["walk_id"], r["step"]): r["node"]
             for r in random_walks(e, walks_per_node=2, length=3).collect()}
    assert rows == rows2
    nbrs = {}
    for u, v in [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    for (start, wid, step), node in rows.items():
        if step == 0:
            assert node == start
        else:
            assert node in nbrs[rows[(start, wid, step - 1)]]
    # every node starts walks_per_node walks
    starts = {(s, w) for (s, w, st) in rows if st == 0}
    assert starts == {(n, w) for n in "abcd" for w in (0, 1)}


def test_random_walks_end_at_sinks_and_diverge_by_walk_id(spark):
    from rdf_n3_spark.operators.graph_algo import random_walks
    from pyspark.sql import functions as F

    # a path graph's interior keeps walking; with >1 neighbor the
    # hash draw must (on SOME node/step) pick differently for the two
    # walk ids — a constant choice would mean walk_id is ignored
    e = _walk_edges(spark, [("a", "b"), ("b", "c"), ("b", "d"),
                            ("c", "e"), ("d", "e")])
    rows = {(r["start"], r["walk_id"], r["step"]): r["node"]
            for r in random_walks(e, walks_per_node=2, length=4).collect()}
    assert any(rows[(s, 0, st)] != rows.get((s, 1, st))
               for (s, w, st) in rows if w == 0 and st > 0)
    # walks never emit a step with no edge taken: a 1-degree sink
    # bounces back (undirected symmetrization), so all 5 steps exist
    assert all((s, w, st) in rows
               for s in "abcde" for w in (0, 1) for st in range(5))


def test_random_walks_partitioning_independent(spark):
    """The hash draw is keyed on (start, walk_id, step, dst) only —
    repartitioning the edge input must not change any walk."""
    from rdf_n3_spark.operators.graph_algo import random_walks

    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)
             if f"n{i}" != f"n{(i * 7 + 3) % 20}"]
    e1 = _walk_edges(spark, pairs)
    e2 = e1.repartition(17)
    r1 = sorted(map(tuple, random_walks(e1, 2, 3).collect()))
    r2 = sorted(map(tuple, random_walks(e2, 2, 3).collect()))
    assert r1 == r2
