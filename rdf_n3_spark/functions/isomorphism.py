"""RDF graph isomorphism via canonical blank-node labeling.

The reference compares graphs with rdf-isomorphic (blank-node bijection;
spec/spec_helper.rb:5). Our equivalent: deterministic color refinement
(iterative signature hashing over the quad neighborhood) plus
deterministic individualization for symmetric ties, then exact multiset
comparison of relabeled quads. Also provides precision/recall scoring —
the BASELINE.json P/R ≥ 0.95 metric.

Pure Python (runs driver-side over small fixture graphs, or inside a
pandas UDF batched per test document — graphs per doc are tiny; the
*corpus* is what scales, not the individual graph).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

Quad = tuple[str, str, str, str]


def _is_bnode(t: str) -> bool:
    return t.startswith("_:")


def _h(*parts: str) -> str:
    return hashlib.md5("\x1f".join(parts).encode()).hexdigest()


def _refine(quads: list[Quad], colors: dict[str, str]) -> dict[str, str]:
    """Iterate signature hashing until the *partition* of bnodes into
    color classes stops refining (value comparison would never converge
    since each round hashes the previous color into the new one)."""
    def partition(c: dict[str, str]) -> list[tuple[str, ...]]:
        groups: dict[str, list[str]] = defaultdict(list)
        for b, col in c.items():
            groups[col].append(b)
        return sorted(tuple(sorted(v)) for v in groups.values())

    part = partition(colors)
    while True:
        sigs: dict[str, list[str]] = defaultdict(list)
        for s, p, o, g in quads:
            cs = colors.get(s, s)
            cp = colors.get(p, p)
            co = colors.get(o, o)
            cg = colors.get(g, g)
            if _is_bnode(s):
                sigs[s].append(_h("S", cp, co, cg))
            if _is_bnode(p):
                sigs[p].append(_h("P", cs, co, cg))
            if _is_bnode(o):
                sigs[o].append(_h("O", cs, cp, cg))
            if _is_bnode(g):
                sigs[g].append(_h("G", cs, cp, co))
        new = {b: _h(colors[b], *sorted(sigs.get(b, []))) for b in colors}
        new_part = partition(new)
        if new_part == part:
            return new
        colors, part = new, new_part


def canonical_quads(quads: list[Quad]) -> list[Quad]:
    """Relabel all blank nodes canonically; returns sorted quads."""
    bnodes = sorted(
        {t for q in quads for t in q if _is_bnode(t)}
    )
    colors = {b: "" for b in bnodes}
    colors = _refine(quads, colors)

    # individualize symmetric ties deterministically
    guard = 0
    while guard < len(bnodes) + 1:
        guard += 1
        groups: dict[str, list[str]] = defaultdict(list)
        for b, c in colors.items():
            groups[c].append(b)
        tied = sorted((c for c, bs in groups.items() if len(bs) > 1))
        if not tied:
            break
        # pick the smallest tied class; individualize one member.
        # member choice within the class is arbitrary for correctness
        # (they are symmetric at this refinement level) but must be
        # deterministic: take the lexicographically first.
        cls = sorted(groups[tied[0]])
        colors[cls[0]] = _h(colors[cls[0]], "!")
        colors = _refine(quads, colors)

    order = sorted(bnodes, key=lambda b: colors[b])
    label = {b: f"_:c{i}" for i, b in enumerate(order)}

    def rl(t: str) -> str:
        return label.get(t, t)

    return sorted((rl(s), rl(p), rl(o), rl(g)) for s, p, o, g in quads)


def isomorphic(a: list[Quad], b: list[Quad]) -> bool:
    return canonical_quads(a) == canonical_quads(b)


def precision_recall(ours: list[Quad], golden: list[Quad]) -> tuple[float, float]:
    """P/R of our triple set vs the golden one, bnode-bijection-aware
    via canonical labeling of each side independently."""
    ca = set(canonical_quads(ours))
    cb = set(canonical_quads(golden))
    if not ca or not cb:
        return (float(ca == cb), float(ca == cb))
    inter = len(ca & cb)
    return inter / len(ca), inter / len(cb)
