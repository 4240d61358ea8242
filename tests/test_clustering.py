"""Embedding k-means / SemDeDup / cluster sampling (clustering.py):
semantics on hand-built vectors + oracle parity at the smoke SF."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from rdf_n3_spark.operators.clustering import (
    cluster_sample,
    embed_kmeans,
    semdedup_prune,
)
from tests.conftest import SF_SMOKE
from tests.parity import assert_match, duck_run


def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _two_blobs():
    # vec 0 + evens near +e1, vec 1 + odds near +e2 (init spans both)
    a = [1.0, 0.05] + [0.0] * 62
    b = [0.05, 1.0] + [0.0] * 62
    out = []
    for i in range(10):
        base = a if i % 2 == 0 else b
        out.append([x + 0.001 * i for x in base])
    return out


def test_kmeans_separates_blobs(spark):
    rows = embed_kmeans(_embs(spark, _two_blobs()), k=2, iters=2).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(by_cluster) == 2
    evens = {i for i in range(10) if i % 2 == 0}
    assert set(map(frozenset, by_cluster.values())) == {
        frozenset(evens), frozenset(set(range(10)) - evens)}


def test_kmeans_deterministic_across_runs(spark):
    df = _embs(spark, _two_blobs()).repartition(7)
    r1 = sorted(map(tuple, embed_kmeans(df, k=2).collect()))
    r2 = sorted(map(tuple, embed_kmeans(df.repartition(3), k=2).collect()))
    assert r1 == r2


def test_semdedup_drops_higher_id_twin(spark):
    vecs = _two_blobs()
    vecs.append([x * 2.0 for x in vecs[0]])  # vec 10: same direction as 0
    rows = {r["vec_id"]: r for r in
            semdedup_prune(_embs(spark, vecs), threshold=0.99, k=2).collect()}
    assert rows[10]["keep"] == 0  # cos(v0, v10) = 1 ≥ 0.99, 0 < 10
    assert rows[0]["keep"] == 1  # the lower id survives
    assert rows[10]["cluster"] == rows[0]["cluster"]


def test_semdedup_threshold_respected(spark):
    # orthogonal-ish blobs: nothing reaches cos 0.999 across pairs of
    # DISTINCT vectors except the near-identical within-blob neighbors
    rows = semdedup_prune(_embs(spark, _two_blobs()), threshold=1.01, k=2).collect()
    assert all(r["keep"] == 1 for r in rows)  # threshold above max cos


def test_cluster_sample_cap_and_monotone(spark):
    embs = _embs(spark, _two_blobs())
    s2 = {r["vec_id"] for r in cluster_sample(embs, per_cluster=2, k=2).collect()}
    s4 = {r["vec_id"] for r in cluster_sample(embs, per_cluster=4, k=2).collect()}
    assert len(s2) == 4 and len(s4) == 8  # 2 clusters × cap
    assert s2 <= s4  # growing the cap grows each cluster monotonically


def test_oracle_parity_smoke_sf(spark):
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    oracles = entry_mod.oracle_sql()
    assert_match(embed_kmeans(embs),
                 duck_run(oracles["embed_kmeans"], SF_SMOKE), "embed_kmeans")
    assert_match(semdedup_prune(embs, threshold=0.35),
                 duck_run(oracles["semdedup_prune"], SF_SMOKE), "semdedup_prune")
    assert_match(cluster_sample(embs, per_cluster=60),
                 duck_run(oracles["cluster_sample"], SF_SMOKE), "cluster_sample")


# ------------------------------------------------------- label_consistency

def _labeled(spark, vecs, labels):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(l))
         for i, (v, l) in enumerate(zip(vecs, labels))],
        "vec_id long, embedding array<float>, label int",
    )


def test_label_consistency_flags_the_planted_mislabel(spark):
    """Two tight blobs, one odd-one-out label in blob A: its top
    neighbors all carry the blob label, so it (and only it) comes out
    consistent = 0."""
    from rdf_n3_spark.operators.clustering import label_consistency

    vecs = _two_blobs()                     # evens ≈ blob A, odds ≈ B
    labels = [7 if i % 2 == 0 else 3 for i in range(10)]
    labels[4] = 9                           # planted mislabel in A
    out = {r["vec_id"]: r for r in
           label_consistency(_labeled(spark, vecs, labels),
                             k_neighbors=3, k=2).collect()}
    assert out[4]["consistent"] == 0
    assert out[4]["majority_label"] == 7
    assert all(r["consistent"] == 1
               for v, r in out.items() if v != 4)


def test_label_consistency_neighbor_counts_and_ties(spark):
    """n_neighbors is cluster-bounded (cluster of 3 → 2 neighbors even
    with k_neighbors=5) and majority ties break to the SMALLEST label."""
    from rdf_n3_spark.operators.clustering import label_consistency

    # one tight blob of 3: labels 5, 2, 8 → every vector sees one 
    # vote for each other label, tie → smaller label wins
    base = [1.0] + [0.0] * 63
    vecs = [[x + 0.001 * i for x in base] for i in range(3)]
    out = {r["vec_id"]: r for r in
           label_consistency(_labeled(spark, vecs, [5, 2, 8]),
                             k_neighbors=5, k=1).collect()}
    assert all(r["n_neighbors"] == 2 for r in out.values())
    assert out[0]["majority_label"] == 2    # ties 2 vs 8 → 2
    assert out[1]["majority_label"] == 5    # ties 5 vs 8 → 5
    assert out[2]["majority_label"] == 2    # ties 5 vs 2 → 2
    assert all(r["consistent"] == 0 for r in out.values())
    assert all(r["n_agree"] == 1 for r in out.values())


def test_label_consistency_zero_norm_excluded(spark):
    """A zero vector neither judges nor gets judged (the NaN lesson)."""
    from rdf_n3_spark.operators.clustering import label_consistency

    base = [1.0] + [0.0] * 63
    vecs = [[x + 0.001 * i for x in base] for i in range(3)]
    vecs.append([0.0] * 64)                 # degenerate
    out = {r["vec_id"]: r for r in
           label_consistency(_labeled(spark, vecs, [1, 1, 1, 2]),
                             k_neighbors=5, k=1).collect()}
    assert 3 not in out
    assert all(r["consistent"] == 1 and r["n_neighbors"] == 2
               for r in out.values())
