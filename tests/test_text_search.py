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


# ------------------------------------------------------------- BM25


def _bm25_term(tf, dl, avgdl_milli, k1s=1200, bs=750):
    """Python mirror of search_bm25's fixed-point tf normalization."""
    norm6 = (1000 - bs) * 1000 + (bs * ((dl * 1_000_000_000) // avgdl_milli)) // 1000
    den6 = tf * 1_000_000 + (k1s * norm6) // 1000
    return (tf * (k1s + 1000) * 1_000_000) // den6


def _run_bm25(spark, docs, queries, k=10):
    from rdf_n3_spark.functions.text import search_bm25

    d = spark.createDataFrame(docs, ["doc_id", "text"])
    q = spark.createDataFrame(queries, ["query_id", "qtext"])
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in search_bm25(d, q, k=k).collect()
    }


def test_bm25_scores_match_hand_computation(spark):
    docs = [
        (1, "apple banana apple"),          # dl 3
        (2, "banana cherry"),               # dl 2
        (3, "kiwi banana kiwi kiwi"),       # dl 4
        (4, "apple kiwi"),                  # dl 2
    ]
    # N=4, Σdl=11 → avgdl_milli = 11000 DIV 4 = 2750
    # idf_int: apple = 4000 DIV 2 = 2000, cherry = 4000 DIV 1 = 4000
    a = 2750
    expect = {
        1: 2000 * _bm25_term(2, 3, a),   # apple tf 2 in doc1
        2: 4000 * _bm25_term(1, 2, a),   # cherry tf 1 in doc2
        4: 2000 * _bm25_term(1, 2, a),   # apple tf 1 in doc4
    }
    order = sorted(expect, key=lambda d: (-expect[d], d))
    got = _run_bm25(spark, docs, [(100, "apple cherry")])
    assert got == {
        (100, i + 1): (d, expect[d]) for i, d in enumerate(order)
    }


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    """Same tf for the query token, different doc lengths: BM25 must
    rank the shorter document first (the property plain tf-idf lacks —
    search_topk ties these and falls back to doc_id order)."""
    docs = [
        (1, "target filler filler filler filler filler filler filler"),
        (2, "target other"),
    ]
    got = _run_bm25(spark, docs, [(7, "target")])
    assert got[(7, 1)][0] == 2 and got[(7, 2)][0] == 1
    assert got[(7, 1)][1] > got[(7, 2)][1]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    q = spark.createDataFrame([(7, "target")], ["query_id", "qtext"])
    tfidf = {(r["query_id"], r["rank"]): r["doc_id"]
             for r in search_topk(d, q, k=10).collect()}
    assert tfidf[(7, 1)] == 1  # the tie-break BM25 breaks on merit


def test_rrf_fuses_hand_computed_ranks(spark):
    """Two 2-row rankings over the same query, hand-folded: doc 5 is
    rank 1 in system A and rank 2 in B; doc 6 the reverse; doc 7 only
    appears in A at rank 3.  Contribution = 1000000 DIV (60 + rank)."""
    from rdf_n3_spark.functions.text import search_rrf

    a = spark.createDataFrame(
        [(1, 5, 1), (1, 6, 2), (1, 7, 3)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame(
        [(1, 6, 1), (1, 5, 2)], ["query_id", "doc_id", "rank"])
    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
           for r in search_rrf([a, b]).collect()}
    # 1000000//61=16393, //62=16129, //63=15873
    # doc5 = 16393+16129 = 32522; doc6 identical; doc7 = 15873
    # the 32522 tie breaks by doc_id asc → doc5 first
    assert got == {
        (1, 1): (5, 32522),
        (1, 2): (6, 32522),
        (1, 3): (7, 15873),
    }


def test_rrf_k_bounds_output(spark):
    from rdf_n3_spark.functions.text import search_rrf

    a = spark.createDataFrame(
        [(1, d, d) for d in range(1, 8)], ["query_id", "doc_id", "rank"])
    out = search_rrf([a], k=3).collect()
    assert len(out) == 3 and max(r["rank"] for r in out) == 3
