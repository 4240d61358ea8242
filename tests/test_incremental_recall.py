"""Measured recall gate for the incremental ingest gate's
representative-only verify (VERDICT r3 item 4).

``incremental_neardup`` verifies a probing document against the band
bucket's *representative* only — the bounded-skew trade documented in
the operator.  This suite turns the prose claim into a measured floor,
mirroring ``test_lsh_quality``: a seeded corpus of template families
(including families similar enough to share band buckets), driver-side
exact 3-gram Jaccard ground truth, and an asserted recall floor
against the batch ``minhash_neardup_pairs`` machinery's own truth.

Precision stays structural: a batch doc is flagged only after an exact
Jaccard verify against the representative, so every flag is a true
near-dup relationship — the tests assert that too.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import (
    incremental_neardup,
    minhash_neardup_pairs,
    source_dup_matrix,
)

THRESHOLD = 0.8


def _shingles(text):
    toks = text.lower().split(" ")
    return {" ".join(toks[i:i + 3]) for i in range(max(len(toks) - 2, 1))}


def _jac(a, b):
    return len(a & b) / len(a | b)


def _seeded_families():
    """30 templates × (1 corpus base + 3 batch variants).  Templates
    come in near-pairs — template 2t+1 derives from 2t with ~35% word
    substitution (cross-family Jaccard ≈ 0.2-0.5, enough for shared
    band buckets at 2 rows/band) — while variants substitute 1-6 words
    (intra-family Jaccard straddling 0.8)."""
    rng = random.Random(20260818)
    vocab = [f"w{i:03d}" for i in range(600)]
    corpus, batch = [], []
    base = None
    for t in range(30):
        if t % 2 == 0 or base is None:
            base = [rng.choice(vocab) for _ in range(80)]
        else:
            base = list(base)
            for _ in range(28):
                base[rng.randrange(len(base))] = rng.choice(vocab)
        corpus.append((t, " ".join(base)))
        for v in range(3):
            words = list(base)
            for _ in range(rng.randint(1, 5)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            batch.append((1000 + t * 10 + v, " ".join(words)))
    return corpus, batch


def _truth(corpus, batch):
    """batch doc_id → True iff ANY corpus doc has exact 3-gram Jaccard
    ≥ threshold with it (what a full-member verify would find)."""
    cs = {d: _shingles(t) for d, t in corpus}
    out = {}
    for d, t in batch:
        s = _shingles(t)
        out[d] = any(_jac(s, c) >= THRESHOLD for c in cs.values())
    return out


def test_representative_verify_recall_floor(spark):
    corpus_rows, batch_rows = _seeded_families()
    truth = _truth(corpus_rows, batch_rows)
    n_true = sum(truth.values())
    assert n_true >= 30, "seeded corpus must contain true corpus-dups"

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    got = {r["doc_id"]: r["dup_of_corpus"]
           for r in incremental_neardup(batch, corpus).collect()}

    # precision is structural: every flag passed an exact verify
    # against a real corpus member, so it must be a true dup
    cs = {d: _shingles(t) for d, t in corpus_rows}
    bs = {d: _shingles(t) for d, t in batch_rows}
    for d, rep in got.items():
        if rep is not None:
            assert _jac(bs[d], cs[rep]) >= THRESHOLD

    hits = sum(1 for d, is_dup in truth.items()
               if is_dup and got.get(d) is not None)
    recall = hits / n_true
    assert recall >= 0.9, (
        f"representative-only verify recall {recall:.2f} below floor "
        f"({hits}/{n_true})")


def test_injected_batch_pairs_are_used_not_recomputed(spark):
    """Behavioral proof the ``batch_pairs`` injection bypasses the
    internal LSH: injecting an EMPTY pair set yields no dup_of_batch
    flags even though the batch contains intra-batch dups, and
    injecting the real precomputed set reproduces the default run."""
    corpus = spark.createDataFrame(
        [(1, "unrelated corpus text " * 10)], "doc_id long, text string")
    fresh = " ".join(f"y{i}" for i in range(30))
    batch = spark.createDataFrame(
        [(200, fresh), (201, fresh + " tail")], "doc_id long, text string")

    empty = spark.createDataFrame([], "a long, b long")
    out_empty = {r["doc_id"]: r["dup_of_batch"]
                 for r in incremental_neardup(
                     batch, corpus, batch_pairs=empty).collect()}
    assert out_empty == {200: None, 201: None}

    pairs = minhash_neardup_pairs(batch)
    out_inj = sorted(map(tuple, incremental_neardup(
        batch, corpus, batch_pairs=pairs).collect()))
    out_def = sorted(map(tuple, incremental_neardup(batch, corpus).collect()))
    assert out_inj == out_def


def test_injected_pairs_reused_by_source_matrix(spark):
    """source_dup_matrix(pairs=...) consumes the shared pair set: the
    injected run equals the self-contained run, and a doctored pair
    set is reflected verbatim (so LSH demonstrably did not re-run)."""
    template = " ".join(f"w{i}" for i in range(30))
    rows = [(1, template, "crawlA"), (2, template + " x", "crawlB"),
            (3, template + " y", "crawlB"),
            (4, "other content entirely " * 9, "crawlA")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    pairs = minhash_neardup_pairs(docs)
    inj = sorted(map(tuple, source_dup_matrix(docs, pairs=pairs).collect()))
    default = sorted(map(tuple, source_dup_matrix(docs).collect()))
    assert inj == default

    doctored = spark.createDataFrame([(1, 4)], "a long, b long")
    m = {(r["source_a"], r["source_b"]): r["n_pairs"]
         for r in source_dup_matrix(docs, pairs=doctored).collect()}
    assert m == {("crawlA", "crawlA"): 1}
