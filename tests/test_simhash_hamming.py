"""simhash_hamming_pairs: pigeonhole-blocked Hamming-≤k join.

The chunk trick is recall-1 (two signatures within Hamming distance k
over k+1 chunks must agree exactly on ≥1 chunk) and the verify is the
exact disagreement count, so absent hot buckets the operator's output
must EQUAL brute force — the strongest possible property test.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import simhash, simhash_hamming_pairs

K = 3
BITS = 32


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _brute_pairs(spark, docs, k=K, bits=BITS):
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash(docs, bits).collect()}
    out = set()
    for a, b in combinations(sorted(sigs), 2):
        ham = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if ham <= k:
            out.add((a, b, ham))
    return out


def test_equals_brute_force_on_neardup_families(spark):
    # small families of near-identical texts + unrelated filler; no
    # chunk bucket can exceed MAX_BUCKET at this size, so the pigeonhole
    # guarantee applies and output == brute force exactly
    texts = []
    for fam in range(6):
        base = " ".join(f"w{fam}x{j}" for j in range(30))
        texts.append(base)
        texts.append(base + " extra")
        texts.append(base.replace(f"w{fam}x7", "changed"))
    texts += [" ".join(f"u{i}y{j}" for j in range(25)) for i in range(20)]
    docs = _docs(spark, texts)
    got = {(r["a"], r["b"], r["hamming"])
           for r in simhash_hamming_pairs(docs, k=K, bits=BITS).collect()}
    want = _brute_pairs(spark, docs)
    assert got == want
    assert want, "test corpus must actually contain Hamming-close pairs"
    # sanity: distances beyond k exist in the corpus and are excluded
    all_pairs = _brute_pairs(spark, docs, k=BITS)
    assert any(h > K for (_, _, h) in all_pairs)


def test_boundary_k_inclusive(spark):
    # pairs at exactly Hamming k are kept, k+1 dropped — read both
    # thresholds off the same corpus via brute force
    texts = []
    base = " ".join(f"b{j}" for j in range(40))
    for j in range(12):
        texts.append(base.replace(f"b{j}", f"mut{j}"))
    docs = _docs(spark, texts)
    all_pairs = _brute_pairs(spark, docs, k=BITS)
    got = {(r["a"], r["b"], r["hamming"])
           for r in simhash_hamming_pairs(docs, k=K, bits=BITS).collect()}
    assert got == {(a, b, h) for (a, b, h) in all_pairs if h <= K}


def test_hot_bucket_star_keeps_mega_cluster_connected(spark):
    # 40 byte-identical docs: every chunk bucket is hot (>MAX_BUCKET=32),
    # so the pairwise join is skipped and star edges (bucket-min → member)
    # carry the cluster — all 40 docs must end up in one component
    texts = ["identical template text " * 10] * 40
    texts += [" ".join(f"z{i}q{j}" for j in range(20)) for i in range(10)]
    docs = _docs(spark, texts)
    pairs = simhash_hamming_pairs(docs, k=K, bits=BITS).collect()
    # union-find over the emitted edges
    parent = {i: i for i in range(50)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        parent[find(r["a"])] = find(r["b"])
    comp = {find(i) for i in range(40)}
    assert len(comp) == 1, "mega-duplicate family must stay connected"
    # star edges are linear: the hot family contributes ≤ n-1 + small
    # cross-chunk extras, never the quadratic n*(n-1)/2
    fam_edges = [r for r in pairs if r["a"] < 40 and r["b"] < 40]
    assert len(fam_edges) < 40 * 39 / 2 / 4


def test_plan_is_equi_join_no_cartesian(spark):
    texts = [f"doc {i} " + " ".join(f"t{i}n{j}" for j in range(10))
             for i in range(30)]
    plan = simhash_hamming_pairs(_docs(spark, texts))._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
