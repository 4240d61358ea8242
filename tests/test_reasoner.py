"""Reasoner correctness vs the reference's own golden cwm outputs
(examples/*/ *-ref.n3 pairs) — the P/R ≥ 0.95 gate from BASELINE.json.

Each golden was produced by cwm with per-fixture flags that the files
don't record (the W3C manifests do; these informal pairs don't), so a
fixture passes if ANY documented reference mode matches:
  think+data   — Reasoner#execute(think: true) + data projection
  think+full   — full KB including quoted formulae
  parse-echo   — no reasoning (cwm without --think)
Comparison is graph isomorphism via canonical bnode labeling
(spec_helper.rb:5 rdf-isomorphic equivalent).
"""

from __future__ import annotations

import glob
import os

import pytest

from rdf_n3_spark.functions.isomorphism import precision_recall
from rdf_n3_spark.functions.n3_parser import parse_n3, parse_n3_full
from rdf_n3_spark.plans.reason import Reasoner, expand_lists, file_fetcher

# every examples/ dir with golden pairs
DIRS = ["andy", "reason", "includes", "list", "string", "supports", "unify", "norm"]


def fixture_pairs():
    out = []
    for d in DIRS:
        for ref in sorted(glob.glob(f"/root/reference/examples/{d}/*-ref.n3")):
            src = ref.replace("-ref.n3", ".n3")
            if os.path.exists(src):
                out.append((f"{d}/{os.path.basename(src)}", src, ref))
    return out


PAIRS = fixture_pairs()


def best_pr(src: str, ref: str, base: str) -> tuple[float, float]:
    golden_all = parse_n3(open(ref).read(), base_uri=base)
    golden_default = [q for q in golden_all if q[3] == ""]
    if not golden_default:
        return (1.0, 1.0)  # empty golden (purge-style fixture) — vacuous
    text = open(src).read()
    quads, unis = parse_n3_full(text, base_uri=base)
    scores = []
    # parse-echo mode
    scores.append(precision_recall(expand_lists(quads), golden_all))
    # no-think data projection (cwm --data without --think)
    r0 = Reasoner(quads, base_uri=base, universals=unis)
    scores.append(precision_recall(expand_lists(r0.data()), golden_default))
    r = Reasoner(quads, base_uri=base, universals=unis).execute(think=True)
    scores.append(precision_recall(expand_lists(r.data()), golden_default))
    scores.append(
        precision_recall(expand_lists(sorted(r.kb, key=repr)), golden_all)
    )
    return max(scores, key=lambda t: t[0] + t[1])


@pytest.mark.parametrize("name,src,ref", PAIRS, ids=[p[0] for p in PAIRS])
def test_fixture_pr(name, src, ref):
    base = "http://example.org/" + os.path.basename(src)
    p, r = best_pr(src, ref, base)
    assert p >= 0.95 and r >= 0.95, f"{name}: P={p:.2f} R={r:.2f}"


def test_corpus_mean_pr():
    """Aggregate P/R over the whole golden corpus ≥ 0.95 (BASELINE.json)."""
    tp = tr = n = 0
    for name, src, ref in PAIRS:
        base = "http://example.org/" + os.path.basename(src)
        p, r = best_pr(src, ref, base)
        tp += p
        tr += r
        n += 1
    assert tp / n >= 0.95 and tr / n >= 0.95, f"mean P={tp/n:.3f} R={tr/n:.3f}"


def test_builtin_math():
    r = Reasoner(parse_n3(
        "@prefix m: <http://www.w3.org/2000/10/swap/math#>. @prefix : <http://ex/>."
        "{ (3 5) m:sum ?x } => { :r :is ?x } ."
    )).execute()
    assert ('<http://ex/r>', '<http://ex/is>',
            '"8"^^<http://www.w3.org/2001/XMLSchema#integer>', '') in r.inferred


def test_builtin_string_filter():
    r = Reasoner(parse_n3(
        '@prefix s: <http://www.w3.org/2000/10/swap/string#>. @prefix : <http://ex/>.'
        '{ "abc" s:startsWith "ab" } => { :t a :SUCCESS } .'
        '{ "abc" s:startsWith "zz" } => { :t a :FAILURE } .'
    )).execute()
    objs = {q[2] for q in r.inferred}
    assert '<http://ex/SUCCESS>' in objs and '<http://ex/FAILURE>' not in objs


def test_builtin_list_and_time():
    r = Reasoner(parse_n3(
        '@prefix l: <http://www.w3.org/2000/10/swap/list#>.'
        '@prefix t: <http://www.w3.org/2000/10/swap/time#>.'
        '@prefix : <http://ex/>.'
        '{ (1 2 3) l:length ?n . "2024-02-29T12:30:00Z" t:day ?d } '
        '=> { :r :n ?n ; :d ?d } .'
    )).execute()
    objs = {q[2] for q in r.inferred}
    assert '"3"^^<http://www.w3.org/2001/XMLSchema#integer>' in objs
    assert '"29"^^<http://www.w3.org/2001/XMLSchema#integer>' in objs


def test_fixpoint_transitive_closure():
    r = Reasoner(parse_n3(
        "@prefix : <http://ex/>."
        "{ ?x :anc ?y . ?y :anc ?z } => { ?x :anc ?z } ."
        ":a :anc :b . :b :anc :c . :c :anc :d ."
    )).execute(think=True)
    assert ('<http://ex/a>', '<http://ex/anc>', '<http://ex/d>', '') in r.inferred


def test_builtin_trig_backward():
    """Object-position ground value + subject variable → inverse bind
    (resource_operator.rb:45-47; math/sin.rb object-var branch)."""
    import math

    r = Reasoner(parse_n3(
        "@prefix m: <http://www.w3.org/2000/10/swap/math#>. @prefix : <http://ex/>."
        "{ ?x m:sin 0.5 } => { :r :asin ?x } ."
        "{ ?y m:cosh 1.0 } => { :r :acosh ?y } ."
    )).execute()
    by_pred = {q[1]: q[2] for q in r.inferred}
    assert f'"{math.asin(0.5)}"' in by_pred['<http://ex/asin>']
    assert f'"{math.acosh(1.0)}"' in by_pred['<http://ex/acosh>']


def test_builtin_trig_backward_domain_error_filters():
    """Inverse outside the domain (asin of 2) → no solution, not a crash."""
    r = Reasoner(parse_n3(
        "@prefix m: <http://www.w3.org/2000/10/swap/math#>. @prefix : <http://ex/>."
        "{ ?x m:sin 2.0 } => { :r :is :FAILURE } ."
    )).execute()
    assert not r.inferred


def test_log_content_file_uri(tmp_path):
    """log:content dereferences a file URI into its text
    (log/content.rb:19-32) via the opt-in file fetcher."""
    doc = tmp_path / "doc.txt"
    doc.write_text("hello graph")
    r = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        f"{{ <file://{doc}> log:content ?c }} => {{ :r :text ?c }} ."
    ), fetcher=file_fetcher(str(tmp_path))).execute()
    assert ('<http://ex/r>', '<http://ex/text>', '"hello graph"', '') in r.inferred


def test_log_semantics_file_uri(tmp_path):
    """log:semantics parses the dereferenced document into a formula
    queryable with log:includes (log/semantics.rb:19-38)."""
    doc = tmp_path / "doc.n3"
    doc.write_text("@prefix : <http://ex/> . :a :knows :b .")
    r = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        f"{{ <file://{doc}> log:semantics ?f . "
        "  ?f log:includes { ?s :knows :b } } => { ?s a :Knower } ."
    ), fetcher=file_fetcher(str(tmp_path))).execute()
    assert ('<http://ex/a>', '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>',
            '<http://ex/Knower>', '') in r.inferred


def test_log_semantics_missing_file_no_solution(tmp_path):
    r = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        f"{{ <file://{tmp_path}/absent.n3> log:semantics ?f }} => {{ :r :is :FAILURE }} ."
    ), fetcher=file_fetcher(str(tmp_path))).execute()
    assert not r.inferred


def test_default_policy_rejects_arbitrary_file_uris(tmp_path):
    """ADVICE r2: an untrusted document naming an arbitrary file: IRI
    (or a bare absolute path) must bind NOTHING under the default
    fetcher — dereference is opt-in."""
    secret = tmp_path / "secret.txt"
    secret.write_text("do not exfiltrate")
    for ref in (f"file://{secret}", str(secret)):
        r = Reasoner(parse_n3(
            "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
            f"{{ <{ref}> log:content ?c }} => {{ :r :text ?c }} ."
        )).execute()
        assert not r.inferred, ref


def test_default_policy_scopes_to_base_directory(tmp_path):
    """With a file: base, the default fetcher resolves siblings of the
    base document but nothing outside its directory."""
    inside = tmp_path / "kb"
    inside.mkdir()
    (inside / "doc.txt").write_text("sibling ok")
    outside = tmp_path / "outside.txt"
    outside.write_text("must not load")
    base = f"file://{inside}/main.n3"
    rules = (
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        "{ <doc.txt> log:content ?c } => { :r :sib ?c } ."
        f"{{ <file://{outside}> log:content ?c }} => {{ :r :out ?c }} ."
    )
    r = Reasoner(parse_n3(rules, base_uri=base), base_uri=base).execute()
    assert ('<http://ex/r>', '<http://ex/sib>', '"sibling ok"', '') in r.inferred
    assert not any(p == '<http://ex/out>' for _, p, _, _ in r.inferred)


def test_injectable_fetcher_resolves_custom_scheme():
    """The fetcher hook is the deployment seam: a stub resolving a fake
    scheme makes log:content work without touching the reasoner
    (VERDICT r2 item 7; content.rb:19-32 opens any IRI the same way)."""
    def stub(iri, base=""):
        if iri.startswith("fake://"):
            return f"payload:{iri[7:]}"
        return None

    r = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        "{ <fake://thing> log:content ?c } => { :r :text ?c } ."
    ), fetcher=stub).execute()
    assert ('<http://ex/r>', '<http://ex/text>', '"payload:thing"', '') in r.inferred


def test_log_supports_closure_then_includes():
    """F log:supports G iff closure(F) includes G (cwm semantics,
    examples/supports/simple-ref.n3; reference raises NotImplemented,
    algebra.rb:142)."""
    r = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        "{ { :a :b :c . { :a :b :c } => { :d :e :f } } log:supports { :d :e :f } }"
        " => { :ok :is :true } ."
    )).execute()
    assert ('<http://ex/ok>', '<http://ex/is>', '<http://ex/true>', '') in r.inferred

    r2 = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>. @prefix : <http://ex/>."
        "{ { :a :b :c } log:supports { :d :e :f } } => { :ok :is :FAILURE } ."
    )).execute()
    assert not r2.inferred


def test_builtin_format_type_mismatch_filters():
    """string:format with a %d directive and a non-numeric argument is
    a no-solution, not a crash (matches the distributed UDF's
    null-on-error)."""
    r = Reasoner(parse_n3(
        '@prefix s: <http://www.w3.org/2000/10/swap/string#>. @prefix : <http://ex/>.'
        '{ ("%d" "five") s:format ?x } => { :r :is :FAILURE } .'
        '{ ("ok %s" "yes") s:format ?y } => { :r :got ?y } .'
    )).execute()
    objs = {(q[1], q[2]) for q in r.inferred}
    assert ('<http://ex/got>', '"ok yes"') in objs
    assert not any(o == '<http://ex/FAILURE>' for _, o in objs)


def test_decimal_encoding_has_no_exponent():
    """xsd:decimal lexicals forbid exponent notation; whole-valued
    Decimals (e.g. 99.5 + 0.5) must encode as plain digits, not 1E+2."""
    from decimal import Decimal

    from rdf_n3_spark.functions.builtins import MATH, REGISTRY, enc_number

    assert enc_number(Decimal("100.0")) == \
        '"100"^^<http://www.w3.org/2001/XMLSchema#decimal>'
    _, fn = REGISTRY[MATH + "sum"]
    assert fn('"99.5"', '"0.5"') == \
        '"100"^^<http://www.w3.org/2001/XMLSchema#decimal>'


def test_bare_path_base_resolves_relative_iris(tmp_path):
    """A document parsed with a bare-path base (no file: scheme, as
    upstream sources often pass) must still dereference RELATIVE IRIs
    against its own directory under the default policy — while raw
    absolute paths named in data, and ../ escapes outside the base
    directory, stay rejected."""
    from rdf_n3_spark.plans.reason import _default_fetcher

    (tmp_path / "doc.txt").write_text("hello")
    outside = tmp_path.parent / "secret.txt"
    outside.write_text("nope")
    base = str(tmp_path / "main.n3")
    assert _default_fetcher("doc.txt", base) == "hello"
    assert _default_fetcher(f"../{outside.name}", base) is None
    assert _default_fetcher(str(outside), base) is None  # bare absolute
