"""Integrity of the isomorphism checker itself — the P/R gate's
foundation. Positive cases (bnode relabelings must match) AND negative
controls (structurally different graphs must NOT match): a checker that
silently accepts everything would make every fixture 'pass'.
"""

from __future__ import annotations

import random

from rdf_n3_spark.functions.isomorphism import isomorphic, precision_recall


def _g(*triples):
    return [(s, p, o, "") for s, p, o in triples]


def test_bnode_relabeling_is_isomorphic():
    a = _g(("_:x", "<p>", "_:y"), ("_:y", "<p>", "_:x"), ("_:x", "<q>", '"v"'))
    b = _g(("_:n1", "<p>", "_:n2"), ("_:n2", "<p>", "_:n1"), ("_:n1", "<q>", '"v"'))
    assert isomorphic(a, b)


def test_random_relabelings_always_match():
    rng = random.Random(3)
    base = []
    for i in range(12):
        base.append((f"_:b{rng.randrange(6)}", "<p>", f"_:b{rng.randrange(6)}", ""))
        base.append((f"_:b{rng.randrange(6)}", "<q>", f'"{rng.randrange(3)}"', ""))
    for seed in range(5):
        r2 = random.Random(seed)
        names = [f"_:b{i}" for i in range(6)]
        perm = dict(zip(names, r2.sample(names, len(names))))
        relabeled = [(perm.get(s, s), p, perm.get(o, o), g) for s, p, o, g in base]
        r2.shuffle(relabeled)
        assert isomorphic(base, relabeled)


def test_structural_differences_detected():
    a = _g(("_:x", "<p>", "_:y"), ("_:y", "<p>", "_:x"))  # 2-cycle
    b = _g(("_:x", "<p>", "_:y"), ("_:y", "<p>", "_:z"))  # chain
    assert not isomorphic(a, b)
    # same shape, different literal
    c = _g(("_:x", "<q>", '"v"'))
    d = _g(("_:x", "<q>", '"w"'))
    assert not isomorphic(c, d)
    # subset is not isomorphic
    assert not isomorphic(a, a[:1])


def test_symmetric_automorphism_vs_asymmetry():
    """A symmetric star matches its relabeling; breaking one spoke's
    predicate must be detected even though degrees still match."""
    star = _g(*[("_:hub", "<p>", f"_:s{i}") for i in range(4)])
    star2 = _g(*[("_:c", "<p>", f"_:t{i}") for i in range(4)])
    assert isomorphic(star, star2)
    broken = _g(("_:hub", "<p>", "_:s0"), ("_:hub", "<p>", "_:s1"),
                ("_:hub", "<p>", "_:s2"), ("_:hub", "<r>", "_:s3"))
    assert not isomorphic(star, broken)


def test_precision_recall_scoring():
    got = _g(("<a>", "<p>", "<b>"), ("<a>", "<p>", "<c>"))
    want = _g(("<a>", "<p>", "<b>"), ("<a>", "<p>", "<d>"))
    p, r = precision_recall(got, want)
    assert p == 0.5 and r == 0.5
    p2, r2 = precision_recall(got, got)
    assert p2 == 1.0 and r2 == 1.0
