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


def _shingle_sets(surfaces: DataFrame, col: str = "surface") -> DataFrame:
    """(col, sh) shingle arrays, LAZILY checkpointed: the LSH pipeline
    references the sets three times (signatures + both sides of the
    exact-Jaccard verify), and Spark does not share common subtrees
    across join branches — the checkpoint computes the shingles once
    during the first action and every other reference reads the cached
    blocks (measured ~30% off end-to-end minhash dedup at sandbox
    scale; at corpus scale it saves two full re-tokenizations)."""
    return surfaces.select(
        F.col(col), shingle_col(F.col(col)).alias("sh")
    ).localCheckpoint(eager=False)


def minhash_signatures(surfaces: DataFrame, col: str = "surface",
                       n_hashes: int = N_HASHES,
                       shingles: DataFrame | None = None) -> DataFrame:
    """(surface) → (surface, h0..h{n-1}) minhash signature — per-row
    ``array_min(transform(...))`` over the bound shingle array: no
    explode, no groupBy shuffle (the former explode+groupBy shape
    shuffled the whole shingle stream; the min over the same set is
    value-identical, so the DuckDB oracle's explode+groupBy form still
    matches)."""
    sh = shingles if shingles is not None else _shingle_sets(surfaces, col)
    # single-argument lambda only: a 2-param HOF lambda receives
    # (element, INDEX) from Spark, silently clobbering any default-arg
    # binding. F.transform invokes the lambda eagerly inside the
    # comprehension, so capturing the loop variable directly is safe.
    return sh.select(
        col,
        *[
            F.array_min(
                F.transform(F.col("sh"),
                            lambda x: F.md5(F.concat(F.lit(f"{i}|"), x)))
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ],
    )


MAX_BUCKET = 32  # hot-bucket star-collapse threshold


def lsh_candidate_pairs(surfaces: DataFrame, col: str = "surface",
                        n_hashes: int = N_HASHES, bands: int = BANDS,
                        max_bucket: int = MAX_BUCKET,
                        shingles: DataFrame | None = None) -> DataFrame:
    """LSH banding: (a, b) candidate pairs with a < b.

    **Hot-bucket star-collapse**: band buckets larger than
    ``max_bucket`` do NOT enter the pairwise self-join (which would be
    quadratic in the bucket size — the single worst skew failure of
    LSH at 100 TB).  Instead each oversized bucket emits *star edges*
    ``(bucket-min id, member)`` — linear in the bucket size and
    skew-bounded.  A ≥ max_bucket-copy near-duplicate template family
    agrees with its copies on EVERY band, so all of its buckets are
    hot; dropping them (the former behavior) lost precisely the
    highest-value dedup clusters.  With star edges the downstream
    exact-Jaccard verify still runs pair-by-pair, and connected
    components still merges the whole cluster through the hub.
    Truly non-discriminative buckets (boilerplate shingles gluing
    *unrelated* docs) cost only a linear verify pass and are then
    discarded by the verify.  Deterministic (pure count + min), so the
    DuckDB oracle mirrors it exactly.

    Plan shape: one groupBy computes bucket (count, min) once; hot keys
    are rare by construction (≤ |rows|/max_bucket) so they broadcast,
    and the pairwise side excludes them with a broadcast anti-join —
    nothing large is ever broadcast."""
    sig = minhash_signatures(surfaces, col, n_hashes, shingles=shingles)
    rows_per_band = n_hashes // bands
    band_arr = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    keyed = sig.select(F.col(col), F.explode(band_arr).alias("band_key"))
    hot = (
        keyed.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"), F.min(col).alias("bucket_min"))
        .where(F.col("n") > max_bucket)
        .select("band_key", "bucket_min")
    )
    kept = keyed.join(F.broadcast(hot.select("band_key")), "band_key", "left_anti")
    left = kept.alias("l")
    right = kept.alias("r")
    pairwise = (
        left.join(right, on="band_key")
        .where(F.col(f"l.{col}") < F.col(f"r.{col}"))
        .select(F.col(f"l.{col}").alias("a"), F.col(f"r.{col}").alias("b"))
    )
    star = (
        keyed.join(F.broadcast(hot), "band_key")
        .where(F.col(col) > F.col("bucket_min"))
        .select(F.col("bucket_min").alias("a"), F.col(col).alias("b"))
    )
    return pairwise.unionByName(star).distinct()


def verified_pairs(surfaces: DataFrame, col: str = "surface",
                   threshold: float = 0.9,
                   n_hashes: int = N_HASHES, bands: int = BANDS,
                   max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Candidate pairs filtered by exact shingle Jaccard ≥ threshold.
    One shared (checkpointed) shingle-set table feeds both the LSH
    signatures and the verify joins."""
    sh = _shingle_sets(surfaces, col)
    pairs = lsh_candidate_pairs(surfaces, col, n_hashes, bands, max_bucket,
                                shingles=sh)
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


def connected_components(edges: DataFrame, max_iter: int = 25,
                         pointer_jump: bool | str = "auto") -> DataFrame:
    """(a, b) undirected edges → (node, comp) with comp = min node id
    reachable. Iterative min-label propagation WITH pointer-jumping:
    each round (a) takes the min over neighbors' labels, then (b)
    shortcuts every label through its own label (comp ← comp[comp]),
    so label paths halve per round and convergence is O(log diameter)
    — a deep chain converges inside the default max_iter, where plain
    neighbor propagation needs diameter rounds and would return
    UNCONVERGED labels silently
    (tests/test_canon_components.py stresses exactly that).

    **One driver action per round**: the previous label rides through
    the round's own aggregation as an ``old`` column, so convergence is
    read off the same materialized result that the next round consumes
    — no separate changed-join + count job. The per-round checkpoints
    are *lazy*: the single ``first()`` on the round's change-count both
    materializes the checkpointed labels (truncating lineage for the
    next round) and returns the convergence signal
    (tests/test_canon_components.py::test_one_action_per_round pins
    this).

    ``pointer_jump``: ``True`` = jump every round, ``False`` = never
    (the A/B measurement knob), ``"auto"`` (default) = *stall-
    triggered*: plain propagation until a round's change count fails
    to halve — shallow similarity clusters (the overwhelmingly common
    shape) collapse in 2-3 rounds with their deltas crashing, so they
    never pay the jump's self-join (measured 12% of end-to-end
    entity_canon, bench_canon_ab.py), while a long label chain keeps
    its delta nearly flat, trips the stall detector by round 3, and
    converges in O(log diameter) from there. The trigger is a ratio of
    the loop's own change counts — no absolute thresholds to re-tune
    at 1000× the data — and sticky once tripped."""
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
    null_comp = F.lit(None).cast(dict(labels.dtypes)["comp"])
    prev = prev2 = None  # change counts of the last two rounds
    stalled = False
    for _ in range(max_iter):
        if pointer_jump == "auto":
            stalled = stalled or (
                prev is not None and prev2 is not None and prev > prev2 / 2
            )
            do_jump = stalled
        else:
            do_jump = bool(pointer_jump)
        # candidate label for each node: min over (own ∪ neighbors')
        # comps; ``old`` (the node's previous label) rides along — only
        # the own-row carries it, min() ignores the neighbor nulls
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("comp"),
                    null_comp.alias("old"))
        )
        new = (
            labels.select("node", "comp", F.col("comp").alias("old"))
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("old").alias("old"))
            # lazy checkpoint BEFORE the self-join below: the truncated
            # plan both stays flat and sidesteps Catalyst's
            # Union-constraint rewrite on self-joined union plans;
            # materialization happens inside this round's single action
            .localCheckpoint(eager=False)
        )
        if do_jump:
            # pointer-jump: follow the label one step (comp is itself a
            # node id, so map it through the fresh labels) — this is
            # the path-halving that turns O(diameter) into O(log
            # diameter).
            new = (
                new.alias("x")
                .join(new.select(F.col("node").alias("comp"),
                                 F.col("comp").alias("jcomp")).alias("y"),
                      "comp", "left")
                .select("node",
                        F.coalesce(F.col("jcomp"), F.col("comp")).alias("comp"),
                        "old")
            )
        new = (
            new.withColumn("chg", F.col("comp") != F.col("old"))
            .localCheckpoint(eager=False)
        )
        # the round's ONE action: materializes both lazy checkpoints
        # and returns the change count in the same job
        changed = new.agg(F.count_if("chg").alias("n")).first()["n"]
        labels = new.select("node", "comp")
        prev, prev2 = changed, prev
        if changed == 0:
            break
    return labels


def canonical_map(mentions: DataFrame, threshold: float = 0.9,
                  pointer_jump: bool | str = "auto") -> DataFrame:
    """mentions → (surface, canon) where canon = lexicographic min
    surface of the similarity cluster. Singleton surfaces map to
    themselves."""
    surfaces = mentions.select("surface").distinct()
    pairs = verified_pairs(surfaces, threshold=threshold)
    comp = connected_components(pairs.select("a", "b"), pointer_jump=pointer_jump)
    # comp labels are min node ids already = canonical surface
    return (
        surfaces.join(comp, surfaces.surface == comp.node, "left")
        .select(
            "surface",
            F.coalesce(F.col("comp"), F.col("surface")).alias("canon"),
        )
    )
