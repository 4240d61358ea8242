"""Reader ``validate``/``canonicalize`` modes + negative-syntax battery
(VERDICT r3 item 5 — the reference reader's option surface,
reader.rb:24-159; must-fail shape from the TestN3NegativeSyntax half of
spec/suite_parser_spec.rb:63-67; canonical lexical forms per
writer.rb:277-296).

No Spark needed for the grammar-level cases; one distributed test pins
that validate-mode rejections stay on the per-doc fault-isolation path.
"""

from __future__ import annotations

import pytest

from rdf_n3_spark.functions.n3_parser import N3ParseError, parse_n3

PFX = "@prefix : <http://example.org/> .\n"


# ----------------------------------------------------- negative syntax

MALFORMED = [
    # missing final dot
    (":a :b :c", "missing statement terminator"),
    # missing object
    (PFX + ":a :b .", "predicate with no object"),
    # @prefix without a colon in the name
    ("@prefix foo <http://example.org/> .", "prefix name missing colon"),
    # @prefix IRI not an IRIREF
    ('@prefix p: "nope" .', "prefix IRI not an IRIREF"),
    # undefined prefix
    ("und:x und:y und:z .", "undefined prefix"),
    # bad datatype position (^^ must be followed by an IRI/pname)
    (PFX + ':a :b "l"^^ .', "datatype missing"),
    # unbalanced formula brace
    (PFX + ":a :b { :c :d :e . .", "unclosed formula"),
    # unbalanced collection
    (PFX + ":a :b (1 2 .", "unclosed collection"),
    # unbalanced bnode property list
    (PFX + ":a :b [ :c :d .", "unclosed bnode list"),
    # unterminated string (newline inside single-quoted string)
    (PFX + ':a :b "unterminated .', "unterminated string"),
    # bad string escape
    (PFX + ':a :b "bad \\q escape" .', "unknown escape"),
    # bad unicode escape digits
    (PFX + ':a :b "\\uZZZZ" .', "bad unicode escape"),
    # unrecognized character in the token stream
    (PFX + ":a :b :c ~ .", "unrecognized character"),
    # keyword where a term is required
    (PFX + ":a @prefix :c .", "directive in term position"),
    # --- round-5 widening toward spec/reader_spec.rb's validation
    # contexts (bad IRIs / prefixes / lists / encoding edges) ---
    # IRIREF must not contain whitespace
    (PFX + ":a :b <http://example.org/foo bar> .", "iri with space"),
    # IRIREF must not nest '<'
    (PFX + ":a :b <http://example.org/<x> .", "iri with nested angle"),
    # unterminated IRIREF
    (PFX + ":a :b <http://example.org/x .", "unterminated iri"),
    # IRIREF must not span lines
    (PFX + ":a :b <http://ex.org/\nx> .", "iri with newline"),
    # language tag must be present after '@'
    (PFX + ':a :b "x"@ .', "empty lang tag"),
    # language tag must start with a letter
    (PFX + ':a :b "x"@1en .', "digit-first lang tag"),
    # doubled '@'
    (PFX + ':a :b "x"@@en .', "double at in lang tag"),
    # a bare second statement terminator
    (PFX + ":a :b :c . .", "stray extra dot"),
    # undefined prefix in OBJECT position
    (PFX + ":a :b und:z .", "undefined prefix in object"),
    # undefined prefix in DATATYPE position
    (PFX + ':a :b "1"^^und:int .', "undefined prefix in datatype"),
    # collection close with no open
    (PFX + ":a :b 1) .", "stray close paren"),
    # formula close with no open
    (PFX + ":a :b :c . }", "stray close brace"),
    # property-list close with no open
    (PFX + ":a :b :c ] .", "stray close bracket"),
    # @base IRI must be an IRIREF
    ('@base "nope" .', "base iri not an iriref"),
    # a BOM anywhere but offset 0 is content, and not a legal one
    (PFX + ":a :b ﻿:c .", "bom mid-document"),
    # two decimal points cannot tokenize into one numeric object
    (PFX + ":a :b 1.2.3 .", "double-dot numeric"),
    # datatype must be an IRI/pname, not a literal
    (PFX + ':a :b "x"^^"y" .', "datatype is a literal"),
    # \U escape beyond U+10FFFF
    (PFX + ':a :b "\\U00110000" .', "unicode escape out of range"),
    # unterminated long (triple-quoted) string
    (PFX + ':a :b """x .', "unterminated long string"),
    # 'a' (rdf:type shorthand) is only a PREDICATE
    (PFX + ":x :y a .", "a in object position"),
    # @prefix directive missing its terminating dot
    ("@prefix p: <http://example.org/>", "prefix missing dot"),
    # comma promises a second object that never comes
    (PFX + ":a :b :c, .", "comma with no second object"),
    # semicolon before any predicate
    (PFX + ":a ; :b :c .", "objectless leading semicolon"),
]


@pytest.mark.parametrize(
    "doc", [m[0] for m in MALFORMED], ids=[m[1] for m in MALFORMED])
def test_malformed_documents_must_fail(doc):
    with pytest.raises(N3ParseError):
        parse_n3(doc)
    # validate mode must obviously reject them too
    with pytest.raises(N3ParseError):
        parse_n3(doc, validate=True)


def test_leading_bom_is_stripped():
    """Encoding edge the W3C Turtle suite pins (turtle-syntax-bom):
    one leading U+FEFF is metadata and must parse; the mid-document
    BOM above stays a must-fail."""
    quads = parse_n3("﻿" + PFX + ":a :b :c .")
    assert len(quads) == 1


def test_trailing_semicolon_is_legal():
    """Grammar guard for the battery itself: predicateObjectList
    allows a trailing ';' before '.' — the near-miss of the
    leading-semicolon must-fail above must NOT creep into MALFORMED."""
    assert len(parse_n3(PFX + ":a :b :c ; .")) == 1


# ------------------------------------------------------- validate mode

ILL_TYPED = [
    PFX + ':a :b "abc"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    PFX + ':a :b "1.2.3"^^<http://www.w3.org/2001/XMLSchema#decimal> .',
    PFX + ':a :b "1e"^^<http://www.w3.org/2001/XMLSchema#double> .',
    PFX + ':a :b "yes"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
    PFX + ':a :b "2026-13-45"^^<http://www.w3.org/2001/XMLSchema#date> '
          '.'.replace("13-45", "1345"),  # malformed lexical shape
    PFX + ':a :b "25:00"^^<http://www.w3.org/2001/XMLSchema#time> .',
]


@pytest.mark.parametrize("doc", ILL_TYPED)
def test_validate_rejects_ill_typed_literals(doc):
    # lenient default: ill-typed literals flow through as data (the
    # RDF model allows them; reasoner builtins no-solution them)
    assert parse_n3(doc)
    with pytest.raises(N3ParseError):
        parse_n3(doc, validate=True)


def test_validate_accepts_well_typed_literals():
    doc = (PFX + ':a :b "42"^^<http://www.w3.org/2001/XMLSchema#integer>, '
           '"1.5"^^<http://www.w3.org/2001/XMLSchema#decimal>, '
           '"1.0e3"^^<http://www.w3.org/2001/XMLSchema#double>, '
           '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>, '
           '"2026-08-18T12:00:00Z"^^'
           '<http://www.w3.org/2001/XMLSchema#dateTime> .')
    assert len(parse_n3(doc, validate=True)) == 5


# -------------------------------------------------- canonicalize mode

def _obj(doc, **kw):
    quads = parse_n3(PFX + doc, **kw)
    assert len(quads) == 1
    return quads[0][2]


XSD = "http://www.w3.org/2001/XMLSchema#"

CANON_GRID = [
    # token            default lexical     canonical lexical   dtype
    (":a :b 1e3 .", "1e3", "1.0e3", "double"),
    (":a :b 12.3E2 .", "12.3E2", "1.23e3", "double"),
    (":a :b 1.E3 .", "1.0E3", "1.0e3", "double"),
    (":a :b -0.5e-2 .", "-0.5e-2", "-5.0e-3", "double"),
    (":a :b .5 .", "0.5", "0.5", "decimal"),
    (":a :b 1.50 .", "1.50", "1.5", "decimal"),
    (":a :b 007.10 .", "007.10", "7.1", "decimal"),
    (":a :b +7 .", "+7", "7", "integer"),
    (":a :b 007 .", "007", "7", "integer"),
    (":a :b -007 .", "-007", "-7", "integer"),
    (":a :b 0 .", "0", "0", "integer"),
]


@pytest.mark.parametrize("doc,default_lex,canon_lex,dtype", CANON_GRID)
def test_canonicalize_grid(doc, default_lex, canon_lex, dtype):
    assert _obj(doc) == f'"{default_lex}"^^<{XSD}{dtype}>'
    assert _obj(doc, canonicalize=True) == f'"{canon_lex}"^^<{XSD}{dtype}>'


def test_canonicalize_rewrites_explicitly_typed_literals():
    assert _obj(f':a :b "08"^^<{XSD}integer> .', canonicalize=True) \
        == f'"8"^^<{XSD}integer>'
    assert _obj(f':a :b "1"^^<{XSD}boolean> .', canonicalize=True) \
        == f'"true"^^<{XSD}boolean>'
    # non-numeric datatypes untouched
    assert _obj(f':a :b "007"^^<{XSD}string> .', canonicalize=True) \
        == f'"007"^^<{XSD}string>'


def test_canonicalize_leaves_ill_typed_alone_unless_validating():
    # canonicalize alone degrades gracefully on garbage lexical forms;
    # validate+canonicalize rejects them
    assert _obj(f':a :b "abc"^^<{XSD}double> .', canonicalize=True) \
        == f'"abc"^^<{XSD}double>'
    with pytest.raises(N3ParseError):
        _obj(f':a :b "abc"^^<{XSD}double> .', validate=True,
             canonicalize=True)


# -------------------------------------------- distributed fault path

def test_distributed_validate_stays_fault_isolated(spark):
    from rdf_n3_spark.sources.n3_source import parse_documents

    docs = spark.createDataFrame(
        [("good", PFX + ":a :b 42 ."),
         ("ill", PFX + ':a :b "abc"^^<' + XSD + 'integer> .')],
        "doc_id string, n3_text string",
    )
    out = parse_documents(docs, validate=True, canonicalize=True).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc["good"]["ok"] and by_doc["good"]["o"] == f'"42"^^<{XSD}integer>'
    assert not by_doc["ill"]["ok"] and "integer" in by_doc["ill"]["err"]
