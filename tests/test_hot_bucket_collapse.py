"""Hot-bucket star-collapse: mega-duplicate clusters must still dedup.

A template document duplicated ≥ MAX_BUCKET times agrees with its
copies on EVERY LSH band, so all of its band buckets exceed the
hot-bucket cap. The former behavior dropped oversized buckets
entirely — zero candidate pairs for precisely the highest-value dedup
target at 100 TB (boilerplate/template families). The star-collapse
emits linear (bucket-min, member) edges instead, so the exact verify
still sees the cluster and connected components still merges it.

These tests build a 120-copy near-dup template family (far above the
MAX_BUCKET=32 cap), assert the buckets really are hot (the old code
path would have produced nothing), and assert the family collapses to
one cluster — while a second, unrelated family does NOT merge with it
(precision is still enforced by the exact-Jaccard verify).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.canon import (
    MAX_BUCKET,
    canonical_map,
    lsh_candidate_pairs,
)
from rdf_n3_spark.operators.dedup import (
    doc_shingles,
    minhash_cols,
    minhash_neardup_pairs,
)

_WORDS_A = [f"alpha{i:02d}" for i in range(60)]
_WORDS_B = [f"beta{i:02d}" for i in range(60)]


def _family(base_words, tag, n):
    """n near-duplicate copies: the template with only the LAST word
    changed per copy → word-3-gram Jaccard ≈ 55/61 ≈ 0.90 ≥ 0.8."""
    return [
        (f"{tag}{i:03d}", " ".join(base_words[:-1] + [f"{tag}tail{i:03d}"]))
        for i in range(n)
    ]


def _components(pairs):
    """Driver-side union-find over a collected (a, b) edge list."""
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
    return {x: find(x) for x in parent}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_template_family_buckets_are_hot(spark):
    """Sanity: every band bucket of the 120-copy family exceeds
    MAX_BUCKET, i.e. the pre-fix code would have dropped them ALL."""
    docs = _docs(spark, _family(_WORDS_A, "a", 120))
    sig = doc_shingles(docs).select("doc_id", *minhash_cols())
    bands = [
        F.concat_ws("|", F.lit(str(b)), F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}"))
        for b in range(4)
    ]
    keyed = sig.select("doc_id", F.explode(F.array(*bands)).alias("band_key"))
    counts = [r["n"] for r in keyed.groupBy("band_key")
              .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(counts) > MAX_BUCKET


def test_minhash_mega_cluster_collapses(spark):
    """120 near-dup copies + a disjoint 60-copy family + unrelated
    docs: each family forms ONE component; families never merge."""
    rows = (
        _family(_WORDS_A, "a", 120)
        + _family(_WORDS_B, "b", 60)
        + [(f"u{i}", " ".join(f"unique{i}w{j}" for j in range(30)))
           for i in range(10)]
    )
    docs = _docs(spark, rows)
    pairs = [(r["a"], r["b"])
             for r in minhash_neardup_pairs(docs, threshold=0.8).collect()]
    comp = _components(pairs)
    a_ids = {f"a{i:03d}" for i in range(120)}
    b_ids = {f"b{i:03d}" for i in range(60)}
    # every family member is in the edge set and shares one root
    assert {comp[d] for d in a_ids} == {"a000"}
    assert {comp[d] for d in b_ids} == {"b000"}
    # unrelated docs contribute no edges at all
    assert all(not d.startswith("u") for d in comp)


def test_star_collapse_respects_max_bucket_knob(spark):
    """With max_bucket forced tiny, even a 20-copy family exercises the
    star path and still collapses (knob-swept regression guard)."""
    docs = _docs(spark, _family(_WORDS_A, "a", 20))
    pairs = [(r["a"], r["b"])
             for r in minhash_neardup_pairs(docs, threshold=0.8,
                                            max_bucket=4).collect()]
    comp = _components(pairs)
    assert {comp[f"a{i:03d}"] for i in range(20)} == {"a000"}


def test_surface_mega_cluster_canonicalizes(spark):
    """Entity canon: 40 near-identical surfaces (> MAX_BUCKET) all map
    to the lexicographic min; unrelated surfaces map to themselves."""
    base = "acme corporation international holdings division primary operating unit northwestern sector headquarters building complex"
    near = [(f"{base} {i:02d}",) for i in range(40)]
    other = [("zzz totally different entity",), ("qqq another one",)]
    mentions = spark.createDataFrame(near + other, "surface string")
    got = {r["surface"]: r["canon"] for r in canonical_map(mentions).collect()}
    assert all(got[f"{base} {i:02d}"] == f"{base} 00" for i in range(40))
    assert got["zzz totally different entity"] == "zzz totally different entity"


def test_star_edges_appear_in_candidates(spark):
    """lsh_candidate_pairs on a hot surface cluster yields the star
    edges (min, member) for members that share no small bucket."""
    base = "acme corporation international holdings division primary operating unit northwestern sector headquarters building complex"
    surfaces = spark.createDataFrame([(f"{base} {i:02d}",) for i in range(40)],
                                     "surface string")
    pairs = {(r["a"], r["b"])
             for r in lsh_candidate_pairs(surfaces).collect()}
    # the bucket-min surface is connected to every other member
    assert {(f"{base} 00", f"{base} {i:02d}") for i in range(1, 40)} <= pairs
