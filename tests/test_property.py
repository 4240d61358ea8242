"""Property-based invariants (hypothesis) over the pure driver-side
core: writer/parser round-trip, list fold/expand inversion, term codec
totality. These are the invariants every distributed operator leans on
— a randomized counterexample here would surface as silent corruption
at corpus scale.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_n3_spark.functions.builtins import as_number, as_string, enc_string
from rdf_n3_spark.functions.isomorphism import isomorphic
from rdf_n3_spark.functions.n3_parser import literal_parts, parse_n3
from rdf_n3_spark.functions.n3_writer import serialize_n3
from rdf_n3_spark.plans.reason import expand_lists, fold_lists

# ---- term strategies (small alphabets keep shrinking useful)

_local = st.text(alphabet="abcdefgh123", min_size=1, max_size=6)
iris = _local.map(lambda s: f"<http://ex/{s}>")
bnodes = st.integers(0, 5).map(lambda i: f"_:b{i}")
lit_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=12,
)
literals = lit_text.map(enc_string)
subjects = st.one_of(iris, bnodes)
objects = st.one_of(iris, bnodes, literals)

triples = st.tuples(subjects, iris, objects)
graphs = st.lists(triples, min_size=0, max_size=12).map(
    lambda ts: [(s, p, o, "") for s, p, o in ts]
)


@settings(max_examples=150, deadline=None)
@given(graphs)
def test_writer_parser_roundtrip_isomorphic(quads):
    """parse(serialize(G)) ≅ G for arbitrary small graphs — the
    contract log:n3String/parsedAsN3 and the distributed writer sink
    rely on."""
    txt = serialize_n3(quads)
    assert isomorphic(quads, parse_n3(txt))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(objects, min_size=0, max_size=4), min_size=1, max_size=3))
def test_list_expand_fold_inverse(lists_):
    """fold_lists(expand_lists(G)) recovers native list terms for
    graphs whose objects are lists (repository.rb:128-143 inverse
    pair)."""
    quads = [
        (f"<http://ex/s{i}>", "<http://ex/p>", ("L", tuple(items)), "")
        for i, items in enumerate(lists_)
    ]
    expanded = expand_lists(quads)
    # ladder quads are bnode-rooted; folding must give back the lists
    folded = fold_lists(expanded)
    got = {(s, o) for s, p, o, g in folded if p == "<http://ex/p>"}
    want = {(f"<http://ex/s{i}>", ("L", tuple(items)) if items else
             "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>")
            for i, items in enumerate(lists_)}
    assert got == want


_XSD = "http://www.w3.org/2001/XMLSchema#"
typed_lits = st.tuples(
    lit_text, st.sampled_from(["integer", "string", "double", "date", "anyURI"])
).map(lambda t: enc_string(t[0])[:-1] + f'"^^<{_XSD}{t[1]}>')
lang_lits = st.tuples(lit_text, st.sampled_from(["en", "fr", "en-GB", "DE"])).map(
    lambda t: enc_string(t[0]) + "@" + t[1]
)
rich_graphs = st.lists(
    st.tuples(iris, iris, st.one_of(iris, typed_lits, lang_lits)),
    min_size=0, max_size=12,
).map(lambda ts: [(s, p, o, "") for s, p, o in ts])


@settings(max_examples=150, deadline=None)
@given(rich_graphs)
def test_writer_parser_roundtrip_converges(quads):
    """Typed / language-tagged literals: one trip through the writer
    canonicalizes (language tags lowercase, per RDF.rb Literal
    normalization); a second trip is then a fixed point."""
    import re as _re

    once = parse_n3(serialize_n3(quads))
    twice = parse_n3(serialize_n3(once))
    assert isomorphic(once, twice)
    for _, _, o, _ in once:
        m = _re.match(r'^"(?:[^"\\]|\\.)*"@([A-Za-z0-9-]+)$', o or "")
        if m:
            assert m.group(1) == m.group(1).lower()


@settings(max_examples=200, deadline=None)
@given(lit_text)
def test_literal_codec_roundtrip(s):
    """literal_parts(enc_string(s)) recovers s exactly."""
    lex, dt, lang = literal_parts(enc_string(s))
    assert as_string(enc_string(s)) == s
    assert lang is None or lang == ""


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20))
def test_as_number_total(s):
    """Permissive numeric coercion never raises (extensions.rb:90-99:
    non-numeric → 0) — a poisoned literal can't kill a rule pass."""
    v = as_number(f'"{s}"' if '"' not in s and "\\" not in s else enc_string(s))
    assert v is not None
