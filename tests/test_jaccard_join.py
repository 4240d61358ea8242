"""Exact prefix-filtered Jaccard self-join (dedup.jaccard_neardup_pairs).

Unlike the LSH blockers, this operator promises recall 1 at the
threshold: the prefix lemma guarantees every qualifying pair shares a
posted token, and the verify is the exact intersect/union ratio. The
contract tests are therefore strict set-equality against brute force,
plus the scale-shape audits (equi-join only, prefix posting volume a
fraction of the corpus shingle volume).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import doc_shingles, jaccard_neardup_pairs
from tests.conftest import SF_SMOKE

THRESHOLD = 0.8


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _brute_force(documents, threshold=THRESHOLD):
    shs = doc_shingles(documents)
    a = shs.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    b = shs.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")),
        )
        .where(F.col("j") >= threshold)
        .select("a", "b")
    )


def test_jaccard_join_equals_brute_force_on_corpus(spark):
    docs = _docs(spark)
    exact = {(r["a"], r["b"]) for r in _brute_force(docs).collect()}
    got = {(r["a"], r["b"])
           for r in jaccard_neardup_pairs(docs, THRESHOLD).collect()}
    assert got == exact


def test_jaccard_join_finds_perturbed_template_family(spark):
    # 40 near-identical copies of one template (one word varies) plus
    # unrelated docs: the family must fully pair up, recall exactly 1.
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    rows = [(f"t{i:02d}", base + f"tail{i % 2}") for i in range(40)]
    rows += [(f"u{i}", f"completely different content number {i} " * 10)
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    exact = {(r["a"], r["b"]) for r in _brute_force(docs).collect()}
    got = {(r["a"], r["b"])
           for r in jaccard_neardup_pairs(docs, THRESHOLD).collect()}
    assert got == exact
    # the template family actually produced pairs (the test has teeth)
    assert sum(1 for a, b in got if a.startswith("t") and b.startswith("t")) > 100


def test_jaccard_join_plans_as_equi_join(spark):
    plan = jaccard_neardup_pairs(_docs(spark), THRESHOLD)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_prefix_posts_fraction_of_shingles(spark):
    # the scale claim: at t=0.8 each doc posts ~20% of its shingles,
    # so the inverted index is a small fraction of an explode-everything
    # index (which is itself what brute force would need and more).
    docs = _docs(spark)
    total = doc_shingles(docs).select(F.explode("sh")).count()
    sz = F.size("sh")
    plen = F.greatest(
        (sz - F.ceil(F.lit(THRESHOLD) * sz) + 1).cast("int"), F.lit(1)
    )
    posted = doc_shingles(docs).select(plen.alias("p")).agg(F.sum("p")).first()[0]
    assert posted < 0.35 * total
