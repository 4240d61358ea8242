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


def test_pagerank_is_partitioning_independent(spark):
    el = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(60)]
    df = _edges(spark, el)
    r1 = pagerank_quantized(df.repartition(1), iterations=3)
    r32 = pagerank_quantized(df.repartition(32), iterations=3)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r32.collect()))
