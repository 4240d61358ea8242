"""KMV (k-minimum-values) distinct-count sketch.

The classic bottom-k estimator (Bar-Yossef et al. 2002; Beyer et al.
SIGMOD'07): hash every value uniformly into [0, 1); keep the k smallest
hashes per group; if fewer than k distinct hashes exist the count is
exact, otherwise estimate distinct ≈ (k-1) / kth_smallest_hash.

Engine portability is the design constraint here, exactly as with the
quantized embeddings: the hash is md5 (identical hex in Spark and
DuckDB), the fraction is the first 15 hex nibbles as an integer over
16^15 (= 2^60, both fit bigint), and the estimate is computed with ONE
double division of two exactly-representable integers — a single IEEE
operation rounds identically everywhere, so the sketch row is
bit-identical across engines and partitionings (no ln, no float sums).

Scale shape: bottom-k of a set is partition-independent, so ANY
evaluation strategy yields the same rows. This implementation is
distinct → per-group rank window → aggregate; a streaming/huge-key
deployment holds fixed k-sized heaps in a partial aggregate instead,
with identical output — which is why the DuckDB oracle can replay the
math directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^15 = 2^60: the hash-fraction denominator (first 15 md5 nibbles)
_DENOM = 16 ** 15


def kmv_distinct(df: DataFrame, key: str, value, k: int = 64) -> DataFrame:
    """(key, n_seen, kth_hash, est_distinct) per group.

    ``n_seen`` = min(k, distinct values) — the number of sketch slots
    filled; ``kth_hash`` = the k-th smallest md5 (null when the count
    is exact); ``est_distinct`` = exact count below k, else
    floor((k-1) · 2^60 / kth_int).
    """
    hashed = df.select(F.col(key), F.md5(value.cast("string")).alias("h")).distinct()
    w = Window.partitionBy(key).orderBy("h")
    topk = hashed.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    agg = topk.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("max_h"),
    )
    kth_int = F.conv(F.substring("max_h", 1, 15), 16, 10).cast("bigint")
    # (k-1)·2^60 is exact in double (≤ 6 significant bits · 2^60) and
    # kth_int < 2^60 is exact too: one division, one floor — bit-stable
    est = F.floor(
        (F.lit(float(k - 1)) * F.lit(float(_DENOM))) / kth_int.cast("double")
    ).cast("bigint")
    return agg.select(
        key,
        "n_seen",
        F.when(F.col("n_seen") >= k, F.col("max_h")).alias("kth_hash"),
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("bigint"))
        .otherwise(est)
        .alias("est_distinct"),
    )


def kmv_distinct_tokens(documents: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-token KMV per document ``source`` — the pipeline-facing
    wrapper (vocabulary size per corpus slice is a routine curation
    metric; exact countDistinct at 100 TB is a full shuffle of the
    token stream, the sketch caps per-group state at k rows)."""
    toks = documents.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    return kmv_distinct(toks, "source", F.col("tok"), k=k)
