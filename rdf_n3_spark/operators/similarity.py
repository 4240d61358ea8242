"""Similarity search over embedding columns.

* ``ann_topk`` — brute-force quantized-cosine top-k (the exact
  baseline). Query side broadcast, corpus side streamed: at 100 TB the
  corpus never shuffles; per-partition partial top-k would be the next
  refinement (Spark's window already map-side-prunes with rank ≤ k).
* ``ivf_topk`` — the scale path: deterministic sign-bucket coarse
  quantization (hyperoctant IVF). Corpus is bucketed once by the sign
  pattern of its leading dimensions; a query probes only its own
  bucket. Recall < 1 by design; bucket fan-out (probing Hamming-
  adjacent buckets) is the standard recall knob.

Quantized-int dot products keep cosine bit-identical across engines
(see dedup.quantize) — float accumulation order is engine-specific,
int64 sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import quantize


def _cos(ea, eb):
    dot = F.aggregate(
        F.zip_with(ea, eb, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0).cast("bigint"),
                    lambda acc, v: acc + v).cast("double")
    )
    return dot / (norm(ea) * norm(eb))


def ann_topk(embeddings: DataFrame, k: int = 10, max_query_id: int = 20) -> DataFrame:
    """(q, rank, vec_id, cos) — exact top-k by cosine per query vector."""
    q = embeddings.select(
        F.col("vec_id").alias("q"), quantize(F.col("embedding")).alias("eq")
    ).where(F.col("q") < max_query_id)
    t = embeddings.select(
        F.col("vec_id").alias("vec_id"), quantize(F.col("embedding")).alias("et")
    )
    scored = (
        F.broadcast(q).crossJoin(t)
        .where(F.col("q") != F.col("vec_id"))
        .withColumn("cos", _cos(F.col("eq"), F.col("et")))
    )
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "rank", "vec_id", "cos")
    )


def sign_bucket(col, dims: int = 6):
    """Deterministic coarse-quantization key: sign pattern of the
    first ``dims`` dimensions ('1'/'0' per dim) → ≤ 2^dims buckets."""
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(col, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(dims)
        ],
    )


def ivf_topk(embeddings: DataFrame, k: int = 10, max_query_id: int = 20,
             dims: int = 6) -> DataFrame:
    """(q, rank, vec_id, cos) — approximate top-k probing only the
    query's sign bucket. The bucket key is an equi-join column, so the
    probe is a co-partitioned join, not a cross-join."""
    q = embeddings.select(
        F.col("vec_id").alias("q"),
        quantize(F.col("embedding")).alias("eq"),
        sign_bucket(F.col("embedding"), dims).alias("bucket"),
    ).where(F.col("q") < max_query_id)
    t = embeddings.select(
        F.col("vec_id").alias("vec_id"),
        quantize(F.col("embedding")).alias("et"),
        sign_bucket(F.col("embedding"), dims).alias("bucket"),
    )
    scored = (
        F.broadcast(q).join(t, "bucket")
        .where(F.col("q") != F.col("vec_id"))
        .withColumn("cos", _cos(F.col("eq"), F.col("et")))
    )
    w = Window.partitionBy("q").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "rank", "vec_id", "cos")
    )
