"""Parser unit tests, ported *by behavior* from the reference's
reader_spec.rb cases (SURVEY.md §5) — pure Python, no Spark."""

from __future__ import annotations

import glob

import pytest

from rdf_n3_spark.functions.isomorphism import (
    canonical_quads,
    isomorphic,
    precision_recall,
)
from rdf_n3_spark.functions.n3_parser import (
    LOG_IMPLIES,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    N3ParseError,
    literal_parts,
    parse_n3,
)

B = "http://ex/doc"


def q(text, **kw):
    return parse_n3(text, base_uri=kw.pop("base", B), **kw)


# ---------------------------------------------------------------- basics

def test_simple_triple_prefix():
    quads = q("@prefix : <http://ex/> . :a :b :c .")
    assert quads == [("<http://ex/a>", "<http://ex/b>", "<http://ex/c>", "")]


def test_relative_iri_resolution():
    quads = q("<a> <b> <#c> .", base="http://ex/dir/doc")
    assert quads == [("<http://ex/dir/a>", "<http://ex/dir/b>", "<http://ex/dir/doc#c>", "")]


def test_hash_namespace_prefix():
    quads = q("@prefix : <socrates#>. :socrates a :Man.", base="http://ex/socrates.n3")
    assert quads == [
        ("<http://ex/socrates#socrates>", RDF_TYPE, "<http://ex/socrates#Man>", "")
    ]


def test_verb_sugar():
    quads = q("@prefix : <http://ex/>. :a = :b . :c => :d . :e <= :f .")
    assert ("<http://ex/a>", "<http://www.w3.org/2002/07/owl#sameAs>", "<http://ex/b>", "") in quads
    assert ("<http://ex/c>", LOG_IMPLIES, "<http://ex/d>", "") in quads
    # <= inverts
    assert ("<http://ex/f>", LOG_IMPLIES, "<http://ex/e>", "") in quads


def test_is_of_and_has():
    quads = q("@prefix : <http://ex/>. :a is :p of :b . :c has :q :d .")
    assert ("<http://ex/b>", "<http://ex/p>", "<http://ex/a>", "") in quads
    assert ("<http://ex/c>", "<http://ex/q>", "<http://ex/d>", "") in quads


def test_semicolon_comma():
    quads = q("@prefix : <http://ex/>. :s :p1 :o1, :o2 ; :p2 :o3 .")
    assert len(quads) == 3
    assert {t[1] for t in quads} == {"<http://ex/p1>", "<http://ex/p2>"}


# ---------------------------------------------------------------- literals

@pytest.mark.parametrize(
    "lit,lex,dt",
    [
        ("123", "123", "http://www.w3.org/2001/XMLSchema#integer"),
        ("-7", "-7", "http://www.w3.org/2001/XMLSchema#integer"),
        ("4.5", "4.5", "http://www.w3.org/2001/XMLSchema#decimal"),
        (".5", "0.5", "http://www.w3.org/2001/XMLSchema#decimal"),
        ("1e3", "1e3", "http://www.w3.org/2001/XMLSchema#double"),
        ("1.e3", "1.0e3", "http://www.w3.org/2001/XMLSchema#double"),
        ("true", "true", "http://www.w3.org/2001/XMLSchema#boolean"),
    ],
)
def test_numeric_literals(lit, lex, dt):
    quads = q(f"@prefix : <http://ex/>. :s :p {lit} .")
    lexical, dtype, lang = literal_parts(quads[0][2])
    assert (lexical, dtype) == (lex, dt)


def test_string_literals():
    quads = q(
        '@prefix : <http://ex/>. :s :p "plain", "hi"@en-GB, '
        '"typed"^^<http://ex/dt>, """long\nstring""", \'single\' .'
    )
    objs = [literal_parts(t[2]) for t in quads]
    assert ("plain", "", "") in objs
    assert ("hi", "", "en-gb") in objs
    assert ("typed", "http://ex/dt", "") in objs
    assert ("long\nstring", "", "") in objs
    assert ("single", "", "") in objs


def test_escapes():
    quads = q(r'@prefix : <http://ex/>. :s :p "a\tbA\\" .')
    lex, _, _ = literal_parts(quads[0][2])
    assert lex == 'a\tbA\\'


# ---------------------------------------------------------------- bnodes

def test_anon_bnodes_deterministic():
    a = q("@prefix : <http://ex/>. [] :p [ :q [] ] .")
    b = q("@prefix : <http://ex/>. [] :p [ :q [] ] .")
    assert a == b  # byte-identical across parses (skolem determinism)


def test_labeled_bnode_scoped_per_formula():
    quads = q("@prefix : <http://ex/>. _:x :p :o . { _:x :p :o } :is :True .")
    top = [t for t in quads if t[3] == "" and t[1] == "<http://ex/p>"][0]
    inner = [t for t in quads if t[3] != ""][0]
    assert top[0] != inner[0]  # same label, different formula ⇒ different node


def test_collection_ladder():
    quads = q("@prefix : <http://ex/>. :s :p (1 2) .")
    firsts = [t for t in quads if t[1] == RDF_FIRST]
    rests = [t for t in quads if t[1] == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(t[2] == RDF_NIL for t in rests)


def test_empty_collection_is_nil():
    quads = q("@prefix : <http://ex/>. :s :p () .")
    assert quads == [("<http://ex/s>", "<http://ex/p>", RDF_NIL, "")]


def test_paths():
    quads = q("@prefix : <http://ex/>. :a!:b :c :d .")
    # a!b mints bnode n with (a, b, n); n is the subject of (n, c, d)
    mint = [t for t in quads if t[0] == "<http://ex/a>"][0]
    assert mint[1] == "<http://ex/b>"
    n = mint[2]
    assert (n, "<http://ex/c>", "<http://ex/d>", "") in quads
    quads = q("@prefix : <http://ex/>. :a^:b :c :d .")
    mint = [t for t in quads if t[2] == "<http://ex/a>"][0]
    assert mint[1] == "<http://ex/b>"


# ---------------------------------------------------------------- formulae

def test_formula_quads_and_rule():
    quads = q("@prefix : <http://ex/>. { ?x a :Man } => { ?x a :Mortal } . :s a :Man .")
    gs = {t[3] for t in quads}
    assert "" in gs and len(gs) == 3
    rule = [t for t in quads if t[1] == LOG_IMPLIES][0]
    assert rule[0].startswith("_:form_") and rule[2].startswith("_:form_")


def test_nested_formula():
    quads = q("@prefix : <http://ex/>. { :a :b { :c :d :e } } :p :o .")
    inner = [t for t in quads if t[0] == "<http://ex/c>"][0]
    outer = [t for t in quads if t[0] == "<http://ex/a>"][0]
    assert inner[3] != outer[3] != ""


def test_negative_syntax():
    for bad in [":s :p", ":s :p :o ; ,", "@prefix x <http://e/>.", '{ :s :p "x }']:
        with pytest.raises((N3ParseError, Exception)):
            parse_n3(bad + " .")


# ---------------------------------------------------------------- isomorphism

def test_isomorphic_relabel():
    a = q("@prefix : <http://ex/>. _:x :p _:y . _:y :p _:x .")
    b = q("@prefix : <http://ex/>. _:m :p _:n . _:n :p _:m .")
    assert isomorphic(a, b)


def test_non_isomorphic():
    a = q("@prefix : <http://ex/>. _:x :p _:x .")
    b = q("@prefix : <http://ex/>. _:x :p _:y .")
    assert not isomorphic(a, b)


def test_symmetric_ties_canonicalize():
    # two disjoint identical stars — pure symmetry, needs individualization
    a = q("@prefix : <http://ex/>. _:a :p :o . _:b :p :o .")
    b = q("@prefix : <http://ex/>. _:c :p :o . _:d :p :o .")
    assert isomorphic(a, b)


def test_precision_recall():
    a = q("@prefix : <http://ex/>. :s :p :o1 . :s :p :o2 .")
    b = q("@prefix : <http://ex/>. :s :p :o1 . :s :p :o3 .")
    p, r = precision_recall(a, b)
    assert p == 0.5 and r == 0.5


# ---------------------------------------------------------------- corpus

def test_reference_examples_corpus():
    """≥85 of the 89 reference example docs must parse (the rest are
    intentionally malformed snippets: undeclared prefixes, cut-off
    strings)."""
    files = sorted(glob.glob("/root/reference/examples/**/*.n3", recursive=True))
    files += sorted(glob.glob("/root/reference/examples/*.nt"))
    files += sorted(glob.glob("/root/reference/examples/*.ttl"))
    ok = 0
    for f in files:
        try:
            parse_n3(open(f, encoding="utf8", errors="replace").read(),
                     base_uri="http://example.org/" + f.rsplit("/", 1)[-1])
            ok += 1
        except Exception:
            pass
    assert ok >= 85, f"only {ok}/{len(files)} reference examples parsed"


def test_parse_determinism_corpus():
    f = "/root/reference/examples/reason/t2.n3"
    txt = open(f).read()
    assert parse_n3(txt, base_uri=B) == parse_n3(txt, base_uri=B)
    assert canonical_quads(parse_n3(txt, base_uri=B)) == canonical_quads(
        parse_n3(txt, base_uri=B)
    )


def test_read_rdf_extension_dispatch(spark, tmp_path):
    """Format-registry equivalent: .n3/.ttl/.nt all read through the
    whole-file scan + parse stage (format.rb:19-32 behavior)."""
    from rdf_n3_spark.sources.n3_source import format_for, read_rdf

    assert format_for("x.n3") == "text/n3"
    assert format_for("x.TTL") == "text/turtle"
    assert format_for("x.nt") == "application/n-triples"
    assert format_for("x.json") is None

    (tmp_path / "a.ttl").write_text("@prefix : <http://ex/> . :a :b :c .")
    (tmp_path / "b.nt").write_text(
        "<http://ex/s> <http://ex/p> <http://ex/o> .\n"
    )
    q = read_rdf(spark, str(tmp_path / "*"))
    rows = {(r["s"], r["p"], r["o"]) for r in q.where("ok").collect()}
    assert ("<http://ex/a>", "<http://ex/b>", "<http://ex/c>") in rows
    assert ("<http://ex/s>", "<http://ex/p>", "<http://ex/o>") in rows
