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
