"""Scale-shape and recall tests for the embedding operators:

* the bucketed embedding dedup must plan as an equi-join (no
  cross-join anywhere in the physical plan) and its recall vs the
  exact all-pairs result must be measured, not guessed;
* multi-probe IVF must not lose recall vs single-probe and must
  recover boundary neighbors single-probe misses;
* the partial-top-k exact path must return bit-identical results to
  the window-only exact baseline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import embedding_neardup_pairs, quantize
from rdf_n3_spark.operators.similarity import (
    ann_topk,
    ann_topk_partial,
    ivf_topk,
    probe_buckets,
)
from tests.conftest import SF_SMOKE

THRESHOLD = 0.35


def _embs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _exact_pairs(emb, max_query_id=50):
    """All-pairs oracle (the quadratic shape the operator must avoid)."""
    q = emb.select(F.col("vec_id").alias("a"), quantize("embedding").alias("ea"))
    t = emb.select(F.col("vec_id").alias("b"), quantize("embedding").alias("eb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y),
                      F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0).cast("bigint"),
                    lambda acc, v: acc + v).cast("double"))
    return (
        q.crossJoin(t)
        .where((F.col("a") < F.col("b")) & (F.col("a") < max_query_id))
        .withColumn("cos", dot / (norm(F.col("ea")) * norm(F.col("eb"))))
        .where(F.col("cos") >= THRESHOLD)
        .select("a", "b")
    )


def test_embedding_dedup_plans_as_equi_join(spark):
    plan = embedding_neardup_pairs(_embs(spark), threshold=THRESHOLD)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_dedup_recall_vs_exact(spark):
    emb = _embs(spark)
    exact = {(r["a"], r["b"]) for r in _exact_pairs(emb).collect()}
    got = {(r["a"], r["b"])
           for r in embedding_neardup_pairs(emb, threshold=THRESHOLD).collect()}
    assert got <= exact, "blocking must never invent pairs"
    recall = len(got) / len(exact) if exact else 1.0
    # 8 bands × 4 bits banded hyperplane LSH: measured ≈0.65 on this
    # corpus. The sandbox embeddings are UNIFORM RANDOM 64-dim vectors
    # (verified: no high-cosine pairs, no label structure), the hardest
    # case for any LSH — threshold 0.35 sits at ~2.8σ of the random
    # cosine distribution, so above-threshold pairs carry almost no
    # angular locality. Real embedding corpora cluster, which is what
    # banded hyperplane LSH exploits. Assert the measured floor so a
    # regression in the banding is caught.
    assert recall >= 0.55, f"recall {recall:.2f} below measured floor"


def test_ann_multiprobe_recall_uplift(spark):
    emb = _embs(spark)
    truth = {(r["q"], r["vec_id"]) for r in ann_topk(emb, k=10).collect()}
    single = {(r["q"], r["vec_id"]) for r in ivf_topk(emb, k=10, hamming=0).collect()}
    multi = {(r["q"], r["vec_id"]) for r in ivf_topk(emb, k=10, hamming=1).collect()}
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_single, "multi-probe must never lose recall"
    # the probe shell must actually widen the candidate set on this corpus
    assert len(multi) >= len(single)
    # measured: single ≈0.04, multi ≈0.22 on uniform-random vectors (see
    # note in test_embedding_dedup_recall_vs_exact — worst case for
    # sign-bucket locality; the uplift, not the absolute, is the claim)
    assert r_multi >= 0.15, f"recall@10 {r_multi:.2f} below measured floor"


def test_probe_buckets_shape(spark):
    df = spark.createDataFrame([([1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 0.5],)], ["e"])
    arr = df.select(probe_buckets(F.col("e"), dims=6, hamming=1).alias("p")).collect()[0]["p"]
    assert arr[0] == "101101"
    assert len(arr) == 7 and len(set(arr)) == 7
    assert all(sum(a != b for a, b in zip(p, arr[0])) == 1 for p in arr[1:])


def test_ann_topk_partial_matches_exact(spark):
    """The default ann_topk (partial plan) must be bit-identical to the
    independently-shaped window-only oracle."""
    from rdf_n3_spark.operators.similarity import ann_topk_exact_oracle

    emb = _embs(spark)
    base = sorted(tuple(r) for r in ann_topk_exact_oracle(emb, k=10).collect())
    part = sorted(tuple(r) for r in ann_topk(emb, k=10).collect())
    assert part == base


def test_ann_topk_default_is_scale_safe():
    """The caller-facing export must resolve to the partial-top-k plan;
    the crossJoin-all-pairs variant is reachable only under the
    explicit *_exact_oracle name."""
    assert ann_topk is ann_topk_partial
