"""Document deduplication — the training-data-pipeline operator set.

All variants are built-in Column expressions (portable to the DuckDB
oracle) and follow the shapes a 100 TB corpus needs:

* exact        — hash-groupBy (one shuffle, map-side combinable);
* minhash+LSH  — word-3-gram shingles → 8 minhashes → banded buckets
                 (hot-bucket pruned) → verified n-gram Jaccard pairs;
* simhash      — 16-bit signature from per-token md5 nibble high-bits,
                 bucket-groupable (zero joins);
* embedding    — quantized-int dot products so cosine is bit-identical
                 across engines (float sum order is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_n3_spark.operators.canon import MAX_BUCKET, BANDS, N_HASHES


def word_shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column."""
    toks = F.split(F.lower(col), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """(text_hash, survivor doc_id, dup count) — exact duplicate groups."""
    return (
        documents.select(F.col("doc_id"), F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("survivor"), F.count(F.lit(1)).alias("n_dups"))
    )


def _minhash_sig_from_shingles(df: DataFrame, id_col: str, sh_col: str) -> DataFrame:
    sh = df.select(id_col, F.explode(sh_col).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_neardup_pairs(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """(a, b) near-duplicate doc_id pairs: LSH blocking + exact word-
    shingle Jaccard ≥ threshold. Same skeleton as entity canon; the
    hot-bucket prune bounds the self-join at any corpus size."""
    shs = documents.select(
        F.col("doc_id"), word_shingles(F.col("text")).alias("sh")
    )
    sig = _minhash_sig_from_shingles(shs, "doc_id", F.col("sh"))
    rpb = N_HASHES // BANDS
    bands = F.array(
        *[
            F.concat_ws("|", F.lit(str(b)),
                        *[F.col(f"h{b * rpb + r}") for r in range(rpb)])
            for b in range(BANDS)
        ]
    )
    keyed = sig.select("doc_id", F.explode(bands).alias("band_key"))
    small = (
        keyed.groupBy("band_key").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= MAX_BUCKET).select("band_key")
    )
    keyed = keyed.join(F.broadcast(small), "band_key")
    cand = (
        keyed.alias("l").join(keyed.alias("r"), "band_key")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    j = (
        cand.join(shs.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")), "a")
        .join(shs.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("a", "b")


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — bit i of the signature is the sign of the
    sum over tokens of ±1 from the high bit of md5 hex nibble i.
    Pure agg (no join); engine-portable (md5 + substring + CASE)."""
    tok = documents.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    ).withColumn("h", F.md5("tok"))
    high = set("89abcdef")
    aggs = [
        F.sum(
            F.when(F.substring("h", i + 1, 1).isin(*high), 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*aggs)
    sig = F.concat(*[F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
                     for i in range(bits)])
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_buckets(documents: DataFrame) -> DataFrame:
    """Near-dup candidate groups = identical simhash (bucket id + size)."""
    return (
        simhash(documents)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("survivor"))
    )


def quantize(col, scale: int = 1000):
    """float embedding → int array; integer dot products are exact and
    identical across engines (double sums are order-sensitive)."""
    return F.transform(col, lambda x: F.round(x * scale).cast("bigint"))


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                            max_query_id: int = 50) -> DataFrame:
    """(a, b) pairs with quantized-cosine ≥ threshold, for query ids
    < max_query_id vs the full table. At scale the query side is the
    broadcast side; the full table streams."""
    q = embeddings.select(
        F.col("vec_id").alias("a"), quantize(F.col("embedding")).alias("ea")
    ).where(F.col("a") < max_query_id)
    t = embeddings.select(
        F.col("vec_id").alias("b"), quantize(F.col("embedding")).alias("eb")
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0).cast("bigint"),
                    lambda acc, v: acc + v).cast("double")
    )
    pairs = (
        F.broadcast(q).crossJoin(t)
        .where(F.col("a") < F.col("b"))
        .withColumn("cos", dot / (norm(F.col("ea")) * norm(F.col("eb"))))
    )
    return pairs.where(F.col("cos") >= threshold).select("a", "b")
