"""Entity canonicalization: MinHash-LSH blocking + connected components.

North-rule requirement: cluster surface forms via minhash-LSH blocking
plus a connected-components iterative self-join, salted/AQE-protected
against hub-entity skew.

Everything here is built-in Column expressions (md5, transform,
sequence, explode, groupBy-min) — JVM-side, codegen'd, and *exactly
reproducible in DuckDB* for the correctness oracle:

* shingles: lowercase character 3-grams;
* minhash_i(surface) = min over shingles of md5(i || '|' || shingle)
  (md5-hex min is engine-portable, unlike xxhash);
* LSH: 4 bands × 2 rows — surfaces sharing any band key become
  candidate pairs;
* verification: exact shingle-set Jaccard ≥ threshold;
* clustering: iterative min-label propagation (the driver-loop
  fixpoint skeleton shared with the reasoner), ``localCheckpoint`` per
  round to cut lineage.

Scale shape: surfaces are ``distinct`` mention norms (≪ mention count);
the self-join is banded, bounding candidate blowup; the hub entity
shares no band with unrelated surfaces, and the per-round aggregation
is a map-side-combinable min — the skew-sensitive step is the
groupBy(surface) after the shingle explode, which AQE splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 8
BANDS = 4  # × 2 rows


def shingle_col(col, n: int = 3):
    """Distinct lowercase character n-grams of a string column."""
    s = F.lower(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
            lambda i: F.substr(s, i, F.lit(n)),
        )
    )


def minhash_signatures(surfaces: DataFrame, col: str = "surface") -> DataFrame:
    """(surface) → (surface, h0..h7) minhash signature."""
    sh = surfaces.select(
        col, F.explode(shingle_col(F.col(col))).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy(col).agg(*aggs)


MAX_BUCKET = 32  # hot-bucket pruning threshold


def lsh_candidate_pairs(surfaces: DataFrame, col: str = "surface") -> DataFrame:
    """LSH banding: (a, b) candidate pairs with a < b.

    **Hot-bucket pruning**: band buckets larger than MAX_BUCKET are
    dropped before the self-join. A bucket holding a large fraction of
    the corpus means that band is non-discriminative (shared prefixes
    / boilerplate shingles) and would turn the self-join quadratic —
    the single worst skew failure of LSH at 100 TB. Pruning is
    deterministic (a pure count filter), so the DuckDB oracle mirrors
    it exactly; true near-duplicates still collide in their
    discriminative bands."""
    sig = minhash_signatures(surfaces, col)
    rows_per_band = N_HASHES // BANDS
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(BANDS)
        ]
    )
    keyed = sig.select(F.col(col), F.explode(bands).alias("band_key"))
    small = (
        keyed.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= MAX_BUCKET)
        .select("band_key")
    )
    keyed = keyed.join(F.broadcast(small), "band_key")
    left = keyed.alias("l")
    right = keyed.alias("r")
    return (
        left.join(right, on="band_key")
        .where(F.col(f"l.{col}") < F.col(f"r.{col}"))
        .select(F.col(f"l.{col}").alias("a"), F.col(f"r.{col}").alias("b"))
        .distinct()
    )


def verified_pairs(surfaces: DataFrame, col: str = "surface",
                   threshold: float = 0.9) -> DataFrame:
    """Candidate pairs filtered by exact shingle Jaccard ≥ threshold."""
    pairs = lsh_candidate_pairs(surfaces, col)
    sh = surfaces.select(F.col(col), shingle_col(F.col(col)).alias("sh"))
    j = (
        pairs.join(sh.withColumnRenamed(col, "a").withColumnRenamed("sh", "sha"), "a")
        .join(sh.withColumnRenamed(col, "b").withColumnRenamed("sh", "shb"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sha", "shb"))
            / F.size(F.array_union("sha", "shb")),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """(a, b) undirected edges → (node, comp) with comp = min node id
    reachable. Iterative min-label propagation WITH pointer-jumping:
    each round (a) takes the min over neighbors' labels, then (b)
    shortcuts every label through its own label (comp ← comp[comp]),
    so label paths halve per round and convergence is O(log diameter)
    — a 2^25-hop chain converges inside the default max_iter, where
    plain neighbor propagation needs diameter rounds and would return
    UNCONVERGED labels silently on a deep chain
    (tests/test_canon_components.py stresses exactly that).  Each round
    is two shuffles (neighbor groupBy-min + label self-join);
    ``localCheckpoint`` truncates lineage so the plan stays flat."""
    sym = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint()  # evaluate the (expensive) edge pipeline ONCE;
        # every propagation round re-reads the checkpointed blocks
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' comps
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        new = (
            labels.select("node", "comp")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            # checkpoint BEFORE the self-join below: truncating here
            # both flattens lineage and sidesteps Catalyst's
            # Union-constraint rewrite on self-joined union plans
            .localCheckpoint()
        )
        # pointer-jump: follow the label one step (comp is itself a
        # node id, so map it through the fresh labels) — this is the
        # path-halving that turns O(diameter) into O(log diameter).
        # No second checkpoint: the pre-join checkpoint above already
        # bounds lineage, and the label table is tiny next to the edge
        # set, so recomputing this one join per consumer is cheaper
        # than materializing it every round.
        new = (
            new.alias("x")
            .join(new.select(F.col("node").alias("comp"),
                             F.col("comp").alias("jcomp")).alias("y"), "comp", "left")
            .select("node", F.coalesce(F.col("jcomp"), F.col("comp")).alias("comp"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def canonical_map(mentions: DataFrame, threshold: float = 0.9) -> DataFrame:
    """mentions → (surface, canon) where canon = lexicographic min
    surface of the similarity cluster. Singleton surfaces map to
    themselves."""
    surfaces = mentions.select("surface").distinct()
    pairs = verified_pairs(surfaces, threshold=threshold)
    comp = connected_components(pairs.select("a", "b"))
    # comp labels are min node ids already = canonical surface
    return (
        surfaces.join(comp, surfaces.surface == comp.node, "left")
        .select(
            "surface",
            F.coalesce(F.col("comp"), F.col("surface")).alias("canon"),
        )
    )
