"""Measured LSH quality gate (VERDICT r2 item 5): the MinHash blocking
knobs (n_hashes / bands / max_bucket) are public parameters — this
suite pins a precision/recall floor at threshold 0.8 on a seeded
corpus so future tuning has a measured baseline, mirroring the shape
of the P/R ≥ 0.95 isomorphism gate from BASELINE.json.

Theory for the default 8 hashes × 4 bands (2 rows/band): a pair with
true Jaccard J becomes a candidate with p = 1 − (1 − J²)⁴ ≈ 0.98 at
J = 0.8 — so recall at the 0.8 threshold should be near-total, and
precision is EXACTLY 1.0 by construction (every candidate passes the
exact-Jaccard verify). Fewer bands with more rows (2 × 4) drop the
candidate probability to ≈ 0.65 at J = 0.8 — the sweep asserts the
recall ordering the theory predicts.
"""

from __future__ import annotations

import random

from rdf_n3_spark.operators.dedup import minhash_neardup_pairs

THRESHOLD = 0.8


def _seeded_corpus():
    """Deterministic template clusters: 20 templates × 4 variants with
    1-8 word substitutions — pairwise Jaccard straddles the 0.8
    threshold both ways."""
    rng = random.Random(20260817)
    vocab = [f"w{i:03d}" for i in range(500)]
    rows = []
    for t in range(20):
        base = [rng.choice(vocab) for _ in range(40)]
        for v in range(4):
            words = list(base)
            for _ in range(rng.randint(1, 8)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rows.append((f"d{t:02d}_{v}", " ".join(words)))
    return rows


def _true_pairs(rows):
    """Driver-side exact word-3-gram Jaccard ground truth."""
    def sh(text):
        toks = text.lower().split(" ")
        return {" ".join(toks[i:i + 3]) for i in range(max(len(toks) - 2, 1))}

    sets = {d: sh(t) for d, t in rows}
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= THRESHOLD:
                out.add((a, b))
    return out


def _got_pairs(spark, rows, **knobs):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {(r["a"], r["b"])
            for r in minhash_neardup_pairs(df, threshold=THRESHOLD,
                                           **knobs).collect()}


def test_default_knobs_meet_pr_floor(spark):
    rows = _seeded_corpus()
    truth = _true_pairs(rows)
    got = _got_pairs(spark, rows)
    assert truth, "seeded corpus must contain true near-dup pairs"
    # precision is structural: the exact verify admits only true pairs
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f} below measured floor"


def test_band_sweep_orders_recall_as_theory_predicts(spark):
    """More bands (OR-amplification) must not lose recall vs fewer
    bands at the same signature budget; defaults stay unchanged."""
    rows = _seeded_corpus()
    truth = _true_pairs(rows)
    r4 = len(_got_pairs(spark, rows, n_hashes=8, bands=4) & truth) / len(truth)
    r2 = len(_got_pairs(spark, rows, n_hashes=8, bands=2) & truth) / len(truth)
    assert r4 >= r2, f"4-band recall {r4:.2f} < 2-band {r2:.2f}"


def _components(pairs):
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
    return {frozenset(k for k in parent if find(k) == r)
            for r in {find(x) for x in parent}}


def test_max_bucket_knob_preserves_clusters_and_precision(spark):
    """Star-collapse trades direct pair coverage inside hot buckets for
    linear star edges — the PAIR set may shrink (non-hub pairs route
    through the hub), but precision (pairs ⊆ truth) and the connected
    CLUSTERS (what dedup survivorship consumes) must be identical."""
    rows = _seeded_corpus()
    truth = _true_pairs(rows)
    default = _got_pairs(spark, rows)
    tiny = _got_pairs(spark, rows, max_bucket=2)
    assert tiny <= truth  # exact verify still gates every star edge
    assert _components(tiny) == _components(default)


def test_contrastive_pairs_labels_and_pos_set(spark):
    """Label contract on a template corpus: every `pos` has exact
    Jaccard >= 0.8, every `hardneg` lands in [0.05, 0.5), the ambiguous
    zone [0.5, 0.8) is never emitted, j_pct is the exact integer
    (100*|∩|) div |∪|, and the pos set EQUALS minhash_neardup_pairs —
    mining labels never changes the dedup verdict.  Heavier-mutation
    variants (12-22 subs of 40) produce band-colliding mid-Jaccard
    pairs, so the hardneg class is exercised non-vacuously."""
    from rdf_n3_spark.operators.dedup import contrastive_pairs

    rng = random.Random(20260819)
    vocab = [f"w{i:03d}" for i in range(500)]
    rows = []
    for t in range(12):
        base = [rng.choice(vocab) for _ in range(40)]
        for v, subs in enumerate([0, 3, 14, 18, 22]):
            words = list(base)
            for _ in range(subs):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rows.append((f"t{t:02d}_{v}", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id string, text string")

    def sh(text):
        toks = text.lower().split(" ")
        return {" ".join(toks[i:i + 3]) for i in range(max(len(toks) - 2, 1))}

    sets = {d: sh(t) for d, t in rows}
    got = contrastive_pairs(df).collect()
    assert any(r["label"] == "hardneg" for r in got), "hardneg class vacuous"
    assert any(r["label"] == "pos" for r in got)
    for r in got:
        inter = len(sets[r["doc_a"]] & sets[r["doc_b"]])
        uni = len(sets[r["doc_a"]] | sets[r["doc_b"]])
        assert r["j_pct"] == (100 * inter) // uni
        if r["label"] == "pos":
            assert 100 * inter >= 80 * uni
        else:
            assert r["label"] == "hardneg"
            assert 5 * uni <= 100 * inter < 50 * uni
    pos = {(r["doc_a"], r["doc_b"]) for r in got if r["label"] == "pos"}
    dedup = {(r["a"], r["b"])
             for r in minhash_neardup_pairs(df).collect()}
    assert pos == dedup


def test_contrastive_incremental_within_and_cross(spark):
    """The ingest-time miner emits BOTH halves with the same label
    contract: within-batch rows equal the batch miner on the batch,
    cross rows label (corpus representative, new doc) pairs — a
    near-dup of the corpus template mines as `pos`, a 40-token-prefix
    /60-token-tail variant band-collides at exact j_pct 38 and mines
    as `hardneg`, and unrelated docs stay silent."""
    from rdf_n3_spark.operators.dedup import (
        contrastive_pairs,
        contrastive_pairs_incremental,
    )

    tpl = " ".join(f"a{i}" for i in range(40))
    tpl_b = " ".join(f"b{i}" for i in range(40))
    corpus = spark.createDataFrame([(0, tpl)], ["doc_id", "text"])
    batch_rows = [
        (100, tpl + " x"),                                        # cross pos
        (101, tpl + " " + " ".join(f"t0x{j}" for j in range(60))),  # cross hardneg
        (102, tpl_b + " y2"),                                     # within pos w/ 103
        (103, tpl_b + " y3"),
        (104, " ".join(f"u{j}" for j in range(40))),              # silent
    ]
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b, r.j_pct, r.label)
           for r in contrastive_pairs_incremental(batch, corpus).collect()}
    within = {(r.doc_a, r.doc_b, r.j_pct, r.label)
              for r in contrastive_pairs(batch).collect()}
    assert within <= got, "within-batch half must equal the batch miner"
    cross = got - within
    assert {(a, lab) for a, b, j, lab in cross} == {(0, "pos"), (0, "hardneg")}
    by_b = {b: (j, lab) for a, b, j, lab in cross}
    assert by_b[100][1] == "pos" and by_b[100][0] >= 80
    assert by_b[101] == (38, "hardneg")
    assert 104 not in by_b
