"""neardup_clusters: the pairs → components → survivor keep-list.

Pairwise near-dup output is not a dedup decision — transitivity is the
whole point (A≈B and B≈C must collapse to ONE survivor even when
A̸≈C pairwise). These tests pin the operator against a driver-side
union-find over the operator's own verified pairs (so the component
step is checked independently of LSH recall), plus the two boundary
behaviors a keep-list must get right: singletons survive as
themselves, and a mega-template family (hot-bucket star path) yields
exactly one survivor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.canon import MAX_BUCKET
from rdf_n3_spark.operators.dedup import minhash_neardup_pairs, neardup_clusters
from tests.conftest import SF_SMOKE

_WORDS = [f"word{i:03d}" for i in range(100)]


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def _chain_corpus():
    """A drift chain with distance-proportional similarity: doc k is
    the 100-word template with its first k 4-word blocks replaced, the
    replacement content a function of the BLOCK index only (so docs
    k < m differ in exactly blocks k..m-1).  Word-3-gram shingle
    Jaccard: adjacent docs ≈ 0.88-0.92 ≥ 0.8; distance ≥ 3 falls
    below 0.8 (doc 0 vs doc 4 ≈ 82/114 ≈ 0.72) — the chain's ends are
    NOT a near-dup pair, yet transitive closure must put all five in
    one cluster."""
    rows = []
    for k in range(5):
        words = list(_WORDS)
        for j in range(4 * k):
            words[j] = f"drift{j:03d}"
        rows.append((k, " ".join(words)))
    # unrelated singletons
    for k in range(5, 10):
        rows.append((k, " ".join(f"lone{k}w{i}" for i in range(40))))
    return rows


def test_clusters_match_union_find_over_own_pairs(spark):
    docs = _docs_df(spark, _chain_corpus())
    pairs = {
        (r.a, r.b) for r in minhash_neardup_pairs(docs).collect()
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = {r.doc_id: (r.survivor, r.is_dup)
           for r in neardup_clusters(docs).collect()}
    assert set(got) == set(range(10))  # every document labeled
    for d in range(10):
        want = find(d)
        assert got[d] == (want, int(want != d))


def test_chain_collapses_transitively(spark):
    docs = _docs_df(spark, _chain_corpus())
    out = neardup_clusters(docs).collect()
    chain = {r.doc_id: r.survivor for r in out if r.doc_id < 5}
    assert set(chain.values()) == {0}, chain  # one survivor for the chain
    singles = [r for r in out if r.doc_id >= 5]
    assert all(r.survivor == r.doc_id and r.is_dup == 0 for r in singles)


def test_template_family_single_survivor(spark):
    """≥ MAX_BUCKET near-identical copies — the hot-bucket star path —
    must produce ONE survivor and n-1 dups, not silently zero."""
    n = MAX_BUCKET + 8
    rows = [
        (k, " ".join(_WORDS[:-1] + [f"tail{k:03d}"])) for k in range(n)
    ] + [(1000, " ".join(f"other{i}" for i in range(40)))]
    out = neardup_clusters(_docs_df(spark, rows))
    agg = (
        out.groupBy("survivor")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_dup").alias("dups"))
        .collect()
    )
    by_s = {r.survivor: r for r in agg}
    assert by_s[0].n == n and by_s[0].dups == n - 1
    assert by_s[1000].n == 1 and by_s[1000].dups == 0


def test_embedding_clusters_match_union_find(spark):
    """embedding_neardup_clusters labels == driver-side union-find over
    the same full-scope verified pair set (the embedding twin of the
    text-cluster cross-check)."""
    from rdf_n3_spark.operators.dedup import (
        embedding_neardup_clusters,
        embedding_neardup_pairs,
    )

    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pairs = embedding_neardup_pairs(embs, threshold=0.35,
                                    max_query_id=None).collect()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for v in [r["vec_id"] for r in embs.select("vec_id").collect()]:
        expected[v] = find(v) if v in parent else v
    got = {r["vec_id"]: r["survivor"]
           for r in embedding_neardup_clusters(embs, threshold=0.35).collect()}
    assert got == expected
    assert any(s != v for v, s in got.items())  # non-degenerate: dups exist
