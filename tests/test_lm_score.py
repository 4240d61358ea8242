"""Corpus bigram LM scoring (functions.text.lm_score)."""

from __future__ import annotations

import math

from rdf_n3_spark.functions.text import lm_score


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"])


def test_lm_score_hand_computed(spark):
    # corpus bigrams: "a b" ×2, "a c" ×1 → c_w1(a) = 3
    rows = {r["doc_id"]: r for r in
            lm_score(_docs(spark, ["a b", "a b", "a c"])).collect()}
    assert rows[0]["n_bigrams"] == 1
    assert abs(rows[0]["avg_logprob"] - round(math.log(2 / 3), 6)) < 1e-9
    assert abs(rows[2]["avg_logprob"] - round(math.log(1 / 3), 6)) < 1e-9


def test_common_text_outscores_gibberish(spark):
    """Unconditional commonness separates unique-token spam; the
    CONDITIONAL column cannot (P=1 under self-training — documented
    artifact), which is why both exist."""
    common = ["the cat sat on the mat"] * 5
    rare = ["zxq qpw wvx bnm mlk kjh"]
    rows = {r["doc_id"]: r for r in lm_score(_docs(spark, common + rare)).collect()}
    assert rows[0]["avg_logfreq"] > rows[5]["avg_logfreq"]
    assert rows[5]["avg_logprob"] == 0.0  # the self-training artifact, pinned


def test_short_docs_get_null_score(spark):
    rows = {r["doc_id"]: r for r in
            lm_score(_docs(spark, ["single", "two tokens"])).collect()}
    assert rows[0]["n_bigrams"] == 0 and rows[0]["avg_logprob"] is None
    assert rows[1]["n_bigrams"] == 1


def test_hash_embed_deterministic_and_signed(spark):
    """Same text → identical sparse vector on any partitioning; a
    repeated token adds its ±1 twice into the same dim."""
    from rdf_n3_spark.functions.text import hash_embed

    docs = _docs(spark, ["alpha beta alpha", "alpha beta alpha"])
    rows = hash_embed(docs.repartition(5)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["dim"]] = r["value"]
    assert by_doc[0] == by_doc[1]  # identical text → identical vector
    assert sorted(abs(v) for v in by_doc[0].values()) == [1, 2]  # 2×alpha, 1×beta


def test_hash_embed_composes_with_kmeans(spark):
    """The sparse rows densify into the clustering family's input
    shape: two text groups land in two k-means clusters."""
    from pyspark.sql import functions as F

    from rdf_n3_spark.functions.text import hash_embed
    from rdf_n3_spark.operators.clustering import embed_kmeans

    # interleaved so the deterministic init (two lowest ids) spans
    # both groups — ids 0,1 are one doc from each
    texts = ["apple banana cherry date", "wolf xray yak zebra"] * 3
    sparse = hash_embed(_docs(spark, texts))
    dense = (
        sparse.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("dim", "value"))).alias("m"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: F.coalesce(
                    F.element_at("m", d).cast("float"), F.lit(0.0)),
            ).alias("embedding"),
        )
    )
    rows = embed_kmeans(dense, k=2, iters=2).collect()
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert set(map(frozenset, clusters.values())) == {
        frozenset({0, 2, 4}), frozenset({1, 3, 5})}


def test_gopher_quality_rules(spark):
    from rdf_n3_spark.functions.text import gopher_quality

    good = "the quick brown fox jumps over lazy dogs " * 8  # 72 words, stops
    bullets = "\n".join("- item" for _ in range(10))
    symbols = "the " + "# " * 60
    rows = {r["doc_id"]: r for r in gopher_quality(
        _docs(spark, [good, bullets, symbols]), min_stop=1).collect()}
    assert rows[0]["keep"] == 1
    assert rows[1]["bullet_frac"] == 1.0 and rows[1]["keep"] == 0
    assert rows[2]["symbol_ratio"] > 0.1 and rows[2]["keep"] == 0


def test_gopher_quality_word_count_floor_and_nulls(spark):
    from rdf_n3_spark.functions.text import gopher_quality

    rows = {r["doc_id"]: r for r in gopher_quality(
        _docs(spark, ["the of and short", None]), min_stop=1).collect()}
    assert rows[0]["n_words"] == 4 and rows[0]["keep"] == 0  # < 50 words
    assert rows[1]["keep"] == 0  # null text degrades, never errors


def test_gopher_quality_stopword_floor(spark):
    from rdf_n3_spark.functions.text import gopher_quality

    text = "zebra " * 60  # 50+ words, zero canonical stop words
    r0 = gopher_quality(_docs(spark, [text]), min_stop=1).collect()[0]
    assert r0["n_stop_present"] == 0 and r0["keep"] == 0
    r1 = gopher_quality(_docs(spark, [text]), min_stop=0).collect()[0]
    assert r1["keep"] == 1  # the floor is the parameterized knob
