"""search_topk: inverted-index retrieval with integer-exact tf-idf."""

from __future__ import annotations

from rdf_n3_spark.functions.text import search_topk


def _run(spark, docs, queries, k=10):
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    q = spark.createDataFrame(queries, ["query_id", "qtext"])
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in search_topk(d, q, k=k).collect()
    }


def test_scores_match_hand_computation(spark):
    # corpus: 4 docs; token dfs: apple=2, banana=3, cherry=1, kiwi=2
    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "kiwi banana kiwi kiwi"),
        (4, "apple kiwi"),
    ]
    got = _run(spark, docs, [(100, "apple cherry")])
    # idf_int = (4*1000) DIV df: apple=2000, cherry=4000
    # doc1: tf(apple)=2 → 4000; doc2: tf(cherry)=1 → 4000; doc4: 2000
    # tie 4000 between doc1/doc2 breaks by doc_id asc
    assert got == {
        (100, 1): (1, 4000),
        (100, 2): (2, 4000),
        (100, 3): (4, 2000),
    }


def test_repeated_query_token_counts_once(spark):
    docs = [(1, "apple apple"), (2, "pear")]
    once = _run(spark, docs, [(7, "apple")])
    twice = _run(spark, docs, [(7, "apple apple")])
    assert once == twice


def test_k_truncates_per_query(spark):
    docs = [(i, "common unique%d" % i) for i in range(12)]
    got = _run(spark, docs, [(5, "common")], k=3)
    assert sorted(r for (_, r) in got) == [1, 2, 3]
    # deterministic tie-break: identical scores rank by doc_id
    assert [got[(5, r)][0] for r in (1, 2, 3)] == [0, 1, 2]


def test_unmatched_query_yields_no_rows(spark):
    docs = [(1, "alpha beta")]
    assert _run(spark, docs, [(9, "zzz")]) == {}
