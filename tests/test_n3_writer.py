"""Writer round-trip tests: parse(serialize(q)) ≅ q over the reference
example corpus (writer behaviors per SURVEY.md §2.9)."""

from __future__ import annotations

import glob

from rdf_n3_spark.functions.isomorphism import isomorphic
from rdf_n3_spark.functions.n3_parser import parse_n3
from rdf_n3_spark.functions.n3_writer import serialize_n3
from rdf_n3_spark.plans.reason import Reasoner


def test_roundtrip_corpus():
    ok = bad = 0
    for f in sorted(glob.glob("/root/reference/examples/**/*.n3", recursive=True)):
        try:
            q = parse_n3(
                open(f, encoding="utf8", errors="replace").read(),
                base_uri="http://example.org/" + f.rsplit("/", 1)[-1],
            )
        except Exception:
            continue  # malformed snippet files
        q2 = parse_n3(serialize_n3(q))
        ok += isomorphic(q, q2)
        bad += not isomorphic(q, q2)
    assert bad == 0, f"{bad} round-trip failures ({ok} ok)"


def test_predicate_sugar_and_prefixes():
    q = parse_n3(
        "@prefix : <http://ex/>. :a a :T . :a = :b . { :x :y :z } => { :q :r :s } ."
    )
    txt = serialize_n3(q, prefixes={"": "http://ex/"})
    assert " a " in txt and " = " in txt and "=>" in txt
    assert ":a" in txt  # pname compaction


def test_collection_rendering():
    q = parse_n3("@prefix : <http://ex/>. :s :p (1 2 (3)) .")
    txt = serialize_n3(q)
    assert "( 1 2 ( 3 ) )" in txt


def test_literal_lexical_preserved():
    q = parse_n3('@prefix : <http://ex/>. :s :p 4.50, 1e3, "x\\ny" .')
    txt = serialize_n3(q)
    assert "4.50" in txt  # non-canonical lexical form kept (writer.rb:277-296)
    assert "1e3" in txt
    assert '"""' in txt  # multiline quote strategy


def test_log_n3string_builtin():
    r = Reasoner(parse_n3(
        "@prefix log: <http://www.w3.org/2000/10/swap/log#>."
        "@prefix : <http://ex/>."
        "{ { :a :b :c } log:n3String ?s } => { :r :text ?s } ."
    )).execute()
    vals = [q[2] for q in r.inferred if q[1] == "<http://ex/text>"]
    assert len(vals) == 1 and "ex/b" in vals[0]
