"""Embedding k-means + semantic dedup + cluster-balanced sampling.

The curation techniques that need a *global* view of embedding space:

* :func:`embed_kmeans` — Lloyd's k-means with deterministic
  initialization and a FIXED iteration count, in exact int64
  arithmetic over quantized embeddings, so the assignment is
  bit-identical on any engine/cluster/partitioning (and the DuckDB
  oracle replays the unrolled iterations).
* :func:`semdedup_prune` — within-cluster cosine pruning (the
  SemDeDup recipe, Abbas et al. 2023: semantic duplicates land in the
  same k-means cluster; pairwise comparison is confined there).
* :func:`cluster_sample` — per-cluster deterministic quota sampling
  (diversity-preserving subsets: every region of embedding space keeps
  representation, unlike a global Bernoulli draw).

Scale shapes:

* assignment is a broadcast nested-loop against the k-row centroid
  table (k is the scale knob: SemDeDup at web scale uses k large
  enough that |cluster| ≈ corpus/k stays executor-sized) followed by a
  map-side-combinable min — per-row work is k exact dots, no shuffle
  of the corpus;
* the centroid update shuffles (cluster, dim) partial sums — k×dims
  rows after map-side combine, independent of corpus size;
* within-cluster pairwise pruning is an equi-join on the cluster id —
  quadratic only inside one cluster, bounded by the k knob, never a
  corpus cross-join.

Fixed-iteration determinism (iters=2 by default) is a feature, not a
shortcut: convergence-looped k-means is partition-order sensitive on
ties, which breaks replayability/auditability — the property every
operator in this repo guarantees (see operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import quantize

K_CLUSTERS = 8
ITERS = 2
DIMS = 64


def _sq_dist(a, b):
    """Exact int64 squared euclidean distance of two bigint arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _assign(qe: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, e, cluster): nearest centroid, ties to the lower
    cluster id (min over (dist, cluster) structs — deterministic)."""
    joined = qe.crossJoin(F.broadcast(cents)).withColumn(
        "dist", _sq_dist(F.col("e"), F.col("c"))
    )
    return (
        joined.groupBy("vec_id")
        .agg(
            F.first("e").alias("e"),
            F.min(F.struct("dist", "cluster")).alias("m"),
        )
        .select("vec_id", "e", F.col("m.cluster").alias("cluster"))
    )


def _update(assigned: DataFrame, dims: int) -> DataFrame:
    """(cluster, c): new centroids = per-dimension floor(sum/count).
    Partial sums combine map-side; the shuffle is k×dims rows."""
    per_dim = (
        assigned.select("cluster", F.posexplode(F.slice("e", 1, dims)).alias("dim", "v"))
        .groupBy("cluster", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cluster", "dim",
            F.floor(F.col("s") / F.col("n")).cast("bigint").alias("comp"),
        )
    )
    return (
        per_dim.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda x: x["comp"],
            ).alias("c")
        )
    )


def embed_kmeans(embeddings: DataFrame, k: int = K_CLUSTERS,
                 iters: int = ITERS, dims: int = DIMS) -> DataFrame:
    """(vec_id, cluster) — deterministic fixed-iteration Lloyd's
    k-means.  Init: the ``k`` lowest vec_ids' quantized vectors (data-
    independent of partitioning).  Each iteration = broadcast-assign +
    (cluster, dim) partial-sum update; the final output is the
    assignment against the last centroids."""
    qe = embeddings.select(
        "vec_id", quantize(F.slice("embedding", 1, dims)).alias("e")
    ).localCheckpoint(eager=False)  # read once, reused every iteration
    w = Window.orderBy("vec_id")
    cents = (
        qe.orderBy("vec_id").limit(k)
        .select((F.row_number().over(w) - 1).alias("cluster"), F.col("e").alias("c"))
    )
    for _ in range(iters):
        assigned = _assign(qe, cents)
        cents = _update(assigned, dims)
    return _assign(qe, cents).select("vec_id", "cluster")


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x),
            F.lit(0).cast("bigint"), lambda acc, v: acc + v,
        ).cast("double")
    )


def semdedup_prune(embeddings: DataFrame, threshold: float = 0.5,
                   k: int = K_CLUSTERS, iters: int = ITERS,
                   dims: int = DIMS) -> DataFrame:
    """(vec_id, cluster, keep) — SemDeDup: a vector is dropped
    (keep=0) iff a LOWER-id vector in ITS OWN k-means cluster has
    quantized cosine ≥ ``threshold`` with it.  Pairwise comparison
    never leaves a cluster (the k knob bounds |cluster| ≈ corpus/k);
    the exact integer dot makes the verdict engine-portable."""
    qe = embeddings.select(
        "vec_id", quantize(F.slice("embedding", 1, dims)).alias("e")
    ).localCheckpoint(eager=False)
    assign = embed_kmeans(embeddings, k, iters, dims).join(qe, "vec_id")
    a = assign.select(
        "cluster", F.col("vec_id").alias("a"), F.col("e").alias("ea"))
    b = assign.select(
        "cluster", F.col("vec_id").alias("b"), F.col("e").alias("eb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v,
    )
    # zero-norm guard: an all-zero quantized vector would make
    # cos = 0/0 = NaN, and Spark sorts NaN ABOVE every double — so
    # `cos >= threshold` would be TRUE and one degenerate vector would
    # flag its whole cluster as duplicates (DuckDB's NULL-on-/0 would
    # also silently diverge). Degenerate vectors are never duplicate
    # evidence; they keep themselves via the left anti-join below.
    dup_b = (
        a.join(b, "cluster")
        .where(F.col("a") < F.col("b"))
        .withColumn("na", _norm(F.col("ea")))
        .withColumn("nb", _norm(F.col("eb")))
        .where((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return (
        assign.select("vec_id", "cluster")
        .join(dup_b.withColumn("dup", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id", "cluster",
            F.when(F.col("dup").isNull(), 1).otherwise(0).alias("keep"),
        )
    )


def cluster_sample(embeddings: DataFrame, per_cluster: int = 100,
                   k: int = K_CLUSTERS, iters: int = ITERS,
                   dims: int = DIMS, seed: str = "csample-v1") -> DataFrame:
    """(vec_id, cluster) — at most ``per_cluster`` vectors per k-means
    cluster, chosen by seeded-hash rank (deterministic on any
    partitioning; changing ``per_cluster`` grows each cluster's sample
    monotonically).  The diversity-preserving counterpart of
    sampling.corpus_sample: small clusters survive in full instead of
    being washed out by a global rate."""
    assign = embed_kmeans(embeddings, k, iters, dims)
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.concat(F.lit(seed + "|"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    return (
        assign.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_cluster)
        .select("vec_id", "cluster")
    )


def label_consistency(embeddings: DataFrame, k_neighbors: int = 5,
                      k: int = K_CLUSTERS, iters: int = ITERS,
                      dims: int = DIMS) -> DataFrame:
    """(vec_id, label, majority_label, n_agree, n_neighbors,
    consistent) — embedding-space label validation (the Confident-
    Learning-style mislabel screen every labeled training set needs):
    a vector whose k nearest neighbors mostly carry a DIFFERENT label
    is a mislabel candidate (``consistent = 0``).

    Neighborhoods are CLUSTER-BOUNDED, the :func:`semdedup_prune`
    scale discipline: candidates = same deterministic k-means cluster
    only, so pairwise work is Σ|cluster|² (knob ``k`` bounds it),
    never corpus²; the per-vector top-``k_neighbors`` rank window runs
    over cluster-sized candidate lists.  Cosine is the exact
    quantized-int dot over engine-portable doubles; ties break by
    neighbor vec_id.  Zero-norm vectors are excluded from BOTH sides
    (degenerate directions are neither evidence nor judgeable — the
    NaN lesson `semdedup_prune` carries).  Majority ties break toward
    the SMALLEST label; ``n_neighbors`` < ``k_neighbors`` when the
    cluster runs out of candidates."""
    qe = embeddings.select(
        "vec_id", F.col("label").cast("int").alias("label"),
        quantize(F.slice("embedding", 1, dims)).alias("e"),
    ).localCheckpoint(eager=False)
    assign = (
        embed_kmeans(embeddings, k, iters, dims)
        .join(qe, "vec_id")
        .withColumn("n", _norm(F.col("e")))
        .where(F.col("n") > 0)
    )
    a = assign.select(
        "cluster", F.col("vec_id").alias("a"), F.col("label").alias("la"),
        F.col("e").alias("ea"), F.col("n").alias("na"))
    b = assign.select(
        "cluster", F.col("vec_id").alias("b"), F.col("label").alias("lb"),
        F.col("e").alias("eb"), F.col("n").alias("nb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v,
    )
    w_rank = Window.partitionBy("a").orderBy(
        F.col("cos").desc(), F.col("b"))
    nbrs = (
        a.join(b, "cluster")
        .where(F.col("a") != F.col("b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= k_neighbors)
        .select("a", "la", "lb")
    )
    votes = nbrs.groupBy("a", "la", "lb").agg(
        F.count(F.lit(1)).alias("cnt"))
    w_tot = Window.partitionBy("a")
    w_maj = Window.partitionBy("a").orderBy(
        F.col("cnt").desc(), F.col("lb"))
    return (
        votes
        .withColumn("n_neighbors", F.sum("cnt").over(w_tot))
        .withColumn("mr", F.row_number().over(w_maj))
        .where(F.col("mr") == 1)
        .select(
            F.col("a").alias("vec_id"), F.col("la").alias("label"),
            F.col("lb").alias("majority_label"),
            F.col("cnt").cast("bigint").alias("n_agree"),
            F.col("n_neighbors").cast("bigint").alias("n_neighbors"),
            F.when(F.col("lb") == F.col("la"), 1).otherwise(0)
            .alias("consistent"),
        )
    )
