"""Manifest-driven cwm-golden suite.

`examples/manifest.n3` (reference repo) records, per golden pair, the
EXACT cwm flags that produced the -ref output (`test:options
[test:think/test:rules/test:data]`), so unlike test_reasoner.py's
best-of-any-documented-mode scoring, each fixture here runs in its
RECORDED mode:

* think+data — fixpoint closure, data projection (cwm --think --data)
* rules+data — single forward pass (cwm --rules --data)

The manifest itself is parsed with the engine's own N3 parser
(dogfooding the reader on a real-world W3C-style manifest).
"""

from __future__ import annotations

import os

import pytest

from rdf_n3_spark.functions.isomorphism import precision_recall
from rdf_n3_spark.functions.n3_parser import parse_n3, parse_n3_full
from rdf_n3_spark.plans.reason import Reasoner, expand_lists

MANIFEST = "/root/reference/examples/manifest.n3"
EX_DIR = "/root/reference/examples"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
TEST = "http://www.w3.org/2000/10/swap/test.n3#"

#: recorded-mode failures that are PARITY with the reference, not bugs:
#: conjunction's golden keeps the rule statement in the default graph
#: (cwm --data does), but the reference's OWN data() projection drops
#: formula-valued statements (reasoner.rb:184-194) — so its recorded
#: think+data combination is unreproducible under reference semantics.
#: The golden matches exactly as a parse echo, asserted by
#: test_reasoner.py's corpus (P/R 1.0 in that mode).
KNOWN_PARITY_GAPS = {"includes/conjunction.n3"}

#: goldens whose content contradicts the manifest's recorded flags:
#: list/append's golden is a pure parse echo (zero derived statements)
#: while its rules visibly fire on its data under think+data — the
#: committed -ref predates the recorded options. The parse-echo form IS
#: asserted by test_reasoner.py's corpus.
STALE_GOLDENS = {"list/append.n3"}


def _iri(t):
    return t[1:-1] if isinstance(t, str) and t.startswith("<") else None


def load_manifest():
    quads = parse_n3(open(MANIFEST).read(),
                     base_uri="file://" + MANIFEST)
    by_subj: dict = {}
    for s, p, o, g in quads:
        if g != "":
            continue
        by_subj.setdefault(s, {}).setdefault(p, []).append(o)
    cases = []
    for s, props in by_subj.items():
        types = props.get("<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", [])
        if f"<{TEST}CwmTest>" not in types:
            continue
        action = _iri(props[f"<{MF}action>"][0]).replace("file://", "")
        result = _iri(props[f"<{MF}result>"][0]).replace("file://", "")
        opts_node = props.get(f"<{TEST}options>", [None])[0]
        opts = {}
        for p, vals in by_subj.get(opts_node, {}).items():
            if p.startswith(f"<{TEST}"):
                opts[p[len(TEST) + 1:-1]] = any("true" in str(v) for v in vals)
        cases.append((os.path.relpath(action, EX_DIR), action, result, opts))
    return sorted(cases)


CASES = load_manifest()


def test_manifest_loaded():
    assert len(CASES) == 33  # every test:CwmTest entry found
    assert all(os.path.exists(a) for _, a, r, _ in CASES)
    assert all(o.get("data") for _, _, _, o in CASES)


@pytest.mark.parametrize("name,action,result,opts", CASES,
                         ids=[c[0] for c in CASES])
def test_recorded_mode_pr(name, action, result, opts):
    if name in KNOWN_PARITY_GAPS:
        pytest.skip("reference engine cannot run this golden either (parity)")
    if name in STALE_GOLDENS:
        pytest.skip("golden contradicts its recorded flags (see STALE_GOLDENS)")
    if not os.path.exists(result):
        pytest.skip("golden not vendored in this reference snapshot")
    base = "http://example.org/" + os.path.basename(action)
    golden = [q for q in parse_n3(open(result).read(), base_uri=base) if q[3] == ""]
    quads, unis = parse_n3_full(open(action).read(), base_uri=base)
    r = Reasoner(quads, base_uri=base, universals=unis).execute(
        think=bool(opts.get("think"))
    )
    got = expand_lists(r.data())
    if not golden:
        return  # purge-style golden: nothing to assert beyond not crashing
    p, rec = precision_recall(got, golden)
    assert p >= 0.95 and rec >= 0.95, f"{name} ({opts}): P={p:.2f} R={rec:.2f}"


def test_corpus_mean_recorded_mode():
    tp = tr = n = 0
    for name, action, result, opts in CASES:
        if name in KNOWN_PARITY_GAPS or name in STALE_GOLDENS \
                or not os.path.exists(result):
            continue
        base = "http://example.org/" + os.path.basename(action)
        golden = [q for q in parse_n3(open(result).read(), base_uri=base) if q[3] == ""]
        if not golden:
            continue
        quads, unis = parse_n3_full(open(action).read(), base_uri=base)
        r = Reasoner(quads, base_uri=base, universals=unis).execute(
            think=bool(opts.get("think"))
        )
        p, rec = precision_recall(expand_lists(r.data()), golden)
        tp += p
        tr += rec
        n += 1
    assert tp / n >= 0.95 and tr / n >= 0.95, f"mean P={tp/n:.3f} R={tr/n:.3f} over {n}"
