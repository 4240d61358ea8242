"""Pure-Python N3/Turtle/N-Triples parser (no Spark imports).

A fresh recursive-descent implementation of the Notation-3 grammar
(https://w3c.github.io/N3/spec/), written for execution inside Arrow
pandas UDFs: documents are independent, so one executor thread parses
many documents per batch — the embarrassingly-parallel Spark mapping of
rdf-n3's single-threaded statement stream (behavioral reference:
/root/reference/lib/rdf/n3/reader.rb, see SURVEY.md §3.1; no code is
taken from it — it's Ruby/EBNF-driven, this is a hand-rolled Python
scanner + recursive descent).

Term encoding (canonical single-string, N-Triples-flavored):
    IRI      <http://example/x>
    bnode    _:b0
    literal  "lex", "lex"@en, "lex"^^<dtypeIRI>
    variable ?x
Quads are (s, p, o, g) with g == "" for the default graph and
g == the formula's blank node for statements inside { ... }.

Determinism contract (SURVEY.md §1.3): one parse call = one document;
unlabeled bnodes get b0, b1, … in scan order; labeled bnodes are
interned per formula scope; formula nodes are _:form_1, _:form_2, …;
list-ladder cells take "<listbnode>_<idx>". Same text in ⇒ byte-same
quads out on every executor, which is all downstream isomorphism
checking requires.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL = "http://www.w3.org/2002/07/owl#"
LOG = "http://www.w3.org/2000/10/swap/log#"

RDF_TYPE = f"<{RDF}type>"
RDF_FIRST = f"<{RDF}first>"
RDF_REST = f"<{RDF}rest>"
RDF_NIL = f"<{RDF}nil>"
OWL_SAME_AS = f"<{OWL}sameAs>"
LOG_IMPLIES = f"<{LOG}implies>"

#: namespaces the reference reader prepopulates (reader.rb:105-117)
BUILTIN_PREFIXES = {
    "rdf": RDF,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": XSD,
    "log": LOG,
    "math": "http://www.w3.org/2000/10/swap/math#",
    "list": "http://www.w3.org/2000/10/swap/list#",
    "string": "http://www.w3.org/2000/10/swap/string#",
    "time": "http://www.w3.org/2000/10/swap/time#",
    "crypto": "http://www.w3.org/2000/10/swap/crypto#",
    "rei": "http://www.w3.org/2004/06/rei#",
}


class N3ParseError(ValueError):
    def __init__(self, msg: str, pos: int = -1, line: int = -1):
        super().__init__(f"{msg} (line {line}, offset {pos})")
        self.pos = pos
        self.line = line


# ------------------------------------------------------------------ lexer

_TOKEN_SPECS = [
    # order matters: longest / most specific first
    ("COMMENT", r"#[^\n]*"),
    ("WS", r"[ \t\r\n]+"),
    ("STRING3Q", r'"""(?:[^"\\]|\\.|"(?!"")|""(?!"))*"""'),
    ("STRING3A", r"'''(?:[^'\\]|\\.|'(?!'')|''(?!'))*'''"),
    ("STRING1Q", r'"(?:[^"\\\n\r]|\\.)*"'),
    ("STRING1A", r"'(?:[^'\\\n\r]|\\.)*'"),
    ("IRIREF", r"<[^<>\"{}|^`\\\x00-\x20]*>"),
    ("ARROW_R", r"=>"),
    ("ARROW_L", r"<="),
    ("EQUALS", r"="),
    ("CARETS", r"\^\^"),
    ("DOUBLE", r"[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+)"),
    ("DECIMAL", r"[+-]?(?:\d*\.\d+)"),
    ("INTEGER", r"[+-]?\d+"),
    ("ATWORD", r"@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*"),
    # interior dots allowed, trailing dot excluded (Turtle PN_LOCAL rule)
    ("BNODE", r"_:[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?"),
    ("QVAR", r"\?[A-Za-z0-9_]+"),
    # PNAME_LN / PNAME_NS (simplified PN_CHARS incl. unicode letters)
    (
        "PNAME",
        r"(?:[A-Za-z_\u00C0-\uFFFD](?:[\w\u00C0-\uFFFD.\-]*[\w\u00C0-\uFFFD\-])?)?:"
        r"(?:[A-Za-z0-9_\u00C0-\uFFFD%\\](?:[\w\u00C0-\uFFFD.\-%\\]*[\w\u00C0-\uFFFD\-%\\])?)?",
    ),
    ("BAREWORD", r"[A-Za-z_][A-Za-z0-9_\-]*"),
    ("PUNCT", r"[.;,(){}\[\]!^]"),
]
_MASTER_RE = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPECS), re.UNICODE)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            e = s[i + 1]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 2
            elif e == "u":
                try:
                    out.append(chr(int(s[i + 2 : i + 6], 16)))
                except ValueError:
                    raise N3ParseError(f"bad \\u escape {s[i:i + 6]!r}") from None
                i += 6
            elif e == "U":
                try:
                    out.append(chr(int(s[i + 2 : i + 10], 16)))
                except ValueError:
                    raise N3ParseError(f"bad \\U escape {s[i:i + 10]!r}") from None
                i += 10
            else:
                raise N3ParseError(f"bad escape \\{e}")
        else:
            out.append(c)
            i += 1
    return "".join(out)


_PN_LOCAL_ESC_RE = re.compile(r"\\(.)")


# --------------------------------------------- validate / canonicalize
# Lexical-form validity per XSD 1.1 (the must-pass half of the
# reference reader's `validate:` option, reader.rb:24-159; invalid
# typed literals raise in validate mode instead of flowing through).
_XSD_LEXICAL = {
    f"{XSD}integer": re.compile(r"[+-]?\d+\Z"),
    f"{XSD}decimal": re.compile(r"[+-]?(?:\d+\.\d*|\.\d+|\d+)\Z"),
    f"{XSD}double": re.compile(
        r"(?:[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?|[+-]?INF|NaN)\Z"),
    f"{XSD}boolean": re.compile(r"(?:true|false|1|0)\Z"),
    f"{XSD}date": re.compile(r"-?\d{4,}-\d{2}-\d{2}(?:[+-]\d{2}:\d{2}|Z)?\Z"),
    f"{XSD}time": re.compile(
        r"\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:[+-]\d{2}:\d{2}|Z)?\Z"),
    f"{XSD}dateTime": re.compile(
        r"-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:[+-]\d{2}:\d{2}|Z)?\Z"),
}


def _canon_integer(lex: str) -> str:
    """XSD canonical integer: no '+', no leading zeros ('0' stays)."""
    sign = "-" if lex.startswith("-") else ""
    digits = lex.lstrip("+-").lstrip("0") or "0"
    return sign + digits if digits != "0" else "0"


def _canon_decimal(lex: str) -> str:
    """XSD canonical decimal: at least one digit each side of the
    point, no '+', no superfluous leading/trailing zeros."""
    sign = "-" if lex.startswith("-") else ""
    body = lex.lstrip("+-")
    intpart, _, frac = body.partition(".")
    intpart = intpart.lstrip("0") or "0"
    frac = frac.rstrip("0") or "0"
    if intpart == "0" and frac == "0":
        return "0.0"
    return f"{sign}{intpart}.{frac}"


def _canon_double(lex: str) -> str:
    """Canonical double, rdf-n3 writer flavor (writer.rb:277-296 /
    RDF::Literal::Double#canonicalize): one nonzero digit before the
    point, lowercase 'e', minimal exponent — '1e3' → '1.0e3'.
    Decimal-based so the mantissa digits are exact (no binary-float
    round trip)."""
    from decimal import Decimal

    if lex in ("INF", "+INF", "-INF", "NaN"):
        return lex.lstrip("+")
    d = Decimal(lex)
    sign = "-" if d.is_signed() else ""
    if d == 0:
        return f"{sign}0.0e0"
    t = d.normalize().as_tuple()
    digits = "".join(map(str, t.digits))
    exp = t.exponent + len(digits) - 1
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}e{exp}"


def _canon_boolean(lex: str) -> str:
    return {"1": "true", "0": "false"}.get(lex, lex)


_CANONICALIZERS = {
    f"{XSD}integer": _canon_integer,
    f"{XSD}decimal": _canon_decimal,
    f"{XSD}double": _canon_double,
    f"{XSD}boolean": _canon_boolean,
}


def _tokenize(text: str):
    toks = []
    # a single LEADING byte-order mark is encoding metadata, not
    # content (the W3C Turtle suite's turtle-syntax-bom case must
    # parse); a BOM anywhere ELSE stays a must-fail character
    pos = 1 if text.startswith("﻿") else 0
    line = 1
    n = len(text)
    match = _MASTER_RE.match
    append = toks.append
    while pos < n:
        m = match(text, pos)
        if not m:
            raise N3ParseError(f"unrecognized character {text[pos]!r}", pos, line)
        kind = m.lastgroup
        val = m.group()
        if "\n" in val:
            line += val.count("\n")
        pos = m.end()
        if kind in ("WS", "COMMENT"):
            continue
        append((kind, val, line))
    append(("EOF", "", line))
    return toks


# ------------------------------------------------------------------ parser


def _urljoin(base: str, rel: str) -> str:
    """urljoin that preserves a trailing empty fragment/query (urllib's
    urlunsplit drops a bare '#'/'?', but '<socrates#>' must resolve to
    '…/socrates#' for prefix declarations to concatenate correctly)."""
    out = urljoin(base, rel)
    if rel.endswith("#") and not out.endswith("#"):
        out += "#"
    elif rel.endswith("?") and not out.endswith("?"):
        out += "?"
    return out


class _Scope:
    """One formula scope: labeled-bnode interning + universals."""

    __slots__ = ("node", "bn_map", "parent")

    def __init__(self, node: str, parent=None):
        self.node = node  # "" for the document's default graph
        self.bn_map: dict[str, str] = {}
        self.parent = parent


class N3Parser:
    def __init__(self, text: str, base_uri: str = "", list_terms: bool = False,
                 validate: bool = False, canonicalize: bool = False):
        """``validate``/``canonicalize`` mirror the reference reader's
        option surface (reader.rb:24-159): validate raises
        :class:`N3ParseError` on ill-typed XSD literals (the grammar
        itself already must-fails on malformed syntax in every mode);
        canonicalize rewrites numeric/boolean lexical forms to their
        canonical representation (writer.rb:277-296 flavor:
        '1e3' → '1.0e3', '.5' → '0.5', '+007' → '7')."""
        self.toks = _tokenize(text)
        self.i = 0
        self.base = base_uri or ""
        self.prefixes = dict(BUILTIN_PREFIXES)
        self.prefixes[""] = (self.base + "#") if self.base and "#" not in self.base else self.base
        self.quads: list[tuple[str, str, str, str]] = []
        self.bn_counter = 0
        self.form_counter = 0
        self.list_terms = list_terms
        self.scope = _Scope("")
        self.universals: set[str] = set()
        self.keywords_mode = False  # @keywords seen → barewords become :names
        # None = no @keywords directive (all built-in keywords active);
        # a set = only the listed barewords act as keywords
        self.declared_keywords: set[str] | None = None
        self.validate = validate
        self.canonicalize = canonicalize

    def _typed(self, lex: str, dtype: str) -> str:
        """Build '"lex"^^<xsd:dtype>' honoring validate/canonicalize.
        ``lex`` is already escape-encoded; numeric/boolean/temporal
        lexical forms contain no escapes, so the checks operate on it
        directly."""
        full = f"{XSD}{dtype}"
        if self.validate:
            rx = _XSD_LEXICAL.get(full)
            if rx is not None and not rx.match(lex):
                raise N3ParseError(f"invalid xsd:{dtype} literal {lex!r}")
        if self.canonicalize:
            canon = _CANONICALIZERS.get(full)
            if canon is not None:
                try:
                    lex = canon(lex)
                except (ValueError, ArithmeticError):
                    if self.validate:
                        raise N3ParseError(
                            f"invalid xsd:{dtype} literal {lex!r}")
        return f'"{lex}"^^<{full}>'

    # --- token helpers
    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        k, v, ln = self.next()
        if v != val:
            raise N3ParseError(f"expected {val!r}, got {v!r}", self.i, ln)

    # --- term constructors
    def new_bnode(self) -> str:
        b = f"_:b{self.bn_counter}"
        self.bn_counter += 1
        return b

    def labeled_bnode(self, label: str) -> str:
        m = self.scope.bn_map
        if label not in m:
            m[label] = self.new_bnode()
        return m[label]

    def resolve_iri(self, iri: str) -> str:
        if self.base:
            return _urljoin(self.base, iri)
        return iri

    def resolve_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise N3ParseError(f"undefined prefix {pfx!r}:")
        if "\\" in local:  # PN_LOCAL_ESC — rare; skip the regex otherwise
            local = _PN_LOCAL_ESC_RE.sub(r"\1", local)
        return f"<{self.prefixes[pfx]}{local}>"

    def emit(self, s: str, p: str, o: str):
        self.quads.append((s, p, o, self.scope.node))

    # --- grammar
    def parse(self) -> list[tuple[str, str, str, str]]:
        while self.peek()[0] != "EOF":
            self.statement()
        return self.quads

    def statement(self):
        k, v, _ = self.peek()
        if k == "ATWORD" and v in ("@prefix", "@base", "@forAll", "@forSome", "@keywords"):
            self.directive(v)
            self.expect(".")
            return
        if k == "BAREWORD" and v.upper() in ("PREFIX", "BASE") and self._sparql_directive_ahead():
            self.sparql_directive(v.upper())
            return  # no trailing dot
        self.triples()
        self.expect(".")

    def _sparql_directive_ahead(self) -> bool:
        nk = self.toks[self.i + 1][0]
        return nk in ("PNAME", "IRIREF")

    def directive(self, word: str):
        self.next()
        if word == "@prefix":
            k, v, ln = self.next()
            if k != "PNAME" or not v.endswith(":"):
                raise N3ParseError(f"bad @prefix name {v!r}", self.i, ln)
            pfx = v[:-1]
            k2, iri, ln2 = self.next()
            if k2 != "IRIREF":
                raise N3ParseError(f"bad @prefix IRI {iri!r}", self.i, ln2)
            self.prefixes[pfx] = self.resolve_iri(iri[1:-1])
        elif word == "@base":
            k2, iri, ln2 = self.next()
            if k2 != "IRIREF":
                raise N3ParseError(f"bad @base IRI {iri!r}", self.i, ln2)
            self.base = _urljoin(self.base, iri[1:-1]) if self.base else iri[1:-1]
        elif word in ("@forAll", "@forSome"):
            while True:
                t = self.term()
                if word == "@forAll":
                    self.universals.add(t)
                # @forSome terms behave as document-scope bnodes; nothing to do
                if self.peek()[1] == ",":
                    self.next()
                else:
                    break
        elif word == "@keywords":
            # barewords are thereafter names in the default namespace
            # (cwm-era directive; 'a'/'is'/'of'/'has' keep working in verb
            # position regardless of the declared list — pragmatic subset)
            self.keywords_mode = True
            self.declared_keywords = set()
            while self.peek()[0] in ("BAREWORD",):
                self.declared_keywords.add(self.next()[1])
                if self.peek()[1] == ",":
                    self.next()

    def sparql_directive(self, word: str):
        self.next()
        if word == "PREFIX":
            k, v, ln = self.next()
            pfx = v[:-1]
            k2, iri, _ = self.next()
            self.prefixes[pfx] = self.resolve_iri(iri[1:-1])
        else:
            k2, iri, _ = self.next()
            self.base = _urljoin(self.base, iri[1:-1]) if self.base else iri[1:-1]

    def triples(self):
        subj = self.path()
        self.predicate_object_list(subj, optional=True)

    def predicate_object_list(self, subj: str, optional: bool = False):
        if optional and self.peek()[1] in (".", "]", "}") :
            return
        while True:
            verb, inverted = self.verb()
            while True:
                obj = self.path()
                if inverted:
                    self.emit(obj, verb, subj)
                else:
                    self.emit(subj, verb, obj)
                if self.peek()[1] == ",":
                    self.next()
                else:
                    break
            if self.peek()[1] == ";":
                self.next()
                # allow trailing ';' before . ] }
                if self.peek()[1] in (".", "]", "}", ";"):
                    while self.peek()[1] == ";":
                        self.next()
                    return
                continue
            return

    def _kw(self, word: str) -> bool:
        """Is this bareword an active keyword? (all are unless an
        @keywords directive declared a restricted set)"""
        return self.declared_keywords is None or word in self.declared_keywords

    def verb(self) -> tuple[str, bool]:
        k, v, _ = self.peek()
        # '@a' / '@is' / '@has' are the @keywords-mode spellings (cwm era)
        if (k == "BAREWORD" and v == "a" and self._kw("a")) or (k == "ATWORD" and v == "@a"):
            self.next()
            return RDF_TYPE, False
        if (k == "BAREWORD" and v == "has" and self._kw("has")) or (k == "ATWORD" and v == "@has"):
            self.next()
            return self.path(), False
        if (k == "BAREWORD" and v == "is" and self._kw("is")) or (k == "ATWORD" and v == "@is"):
            self.next()
            p = self.path()
            kw = self.next()
            if kw[1] not in ("of", "@of"):
                raise N3ParseError(f"expected 'of' after 'is <expr>', got {kw[1]!r}")
            return p, True
        if v == "=":
            self.next()
            return OWL_SAME_AS, False
        if v == "=>":
            self.next()
            return LOG_IMPLIES, False
        if v == "<=":
            self.next()
            return LOG_IMPLIES, True
        return self.path(), False

    def path(self) -> str:
        node = self.term()
        while self.peek()[1] in ("!", "^") and self.peek()[0] == "PUNCT":
            op = self.next()[1]
            pred = self.term()
            nxt = self.new_bnode()
            if op == "!":
                self.emit(node, pred, nxt)
            else:
                self.emit(nxt, pred, node)
            node = nxt
        return node

    def term(self) -> str:
        k, v, ln = self.peek()
        if k == "IRIREF":
            self.next()
            return f"<{self.resolve_iri(v[1:-1])}>" if self.base else f"<{v[1:-1]}>"
        if k == "PNAME":
            self.next()
            return self.resolve_pname(v)
        if k == "BNODE":
            self.next()
            return self.labeled_bnode(v[2:])
        if k == "QVAR":
            self.next()
            return v
        if k == "INTEGER":
            self.next()
            return self._typed(v, "integer")
        if k == "DECIMAL":
            self.next()
            lex = v
            if lex.startswith("."):
                lex = "0" + lex
            elif lex.startswith(("-.", "+.")):
                lex = lex[0] + "0" + lex[1:]
            return self._typed(lex, "decimal")
        if k == "DOUBLE":
            self.next()
            lex = re.sub(r"\.([eE])", r".0\1", v)
            return self._typed(lex, "double")
        if k == "BAREWORD" and v in ("true", "false") and self._kw(v):
            self.next()
            return self._typed(v, "boolean")
        if k == "BAREWORD" and self.keywords_mode:
            self.next()
            return self.resolve_pname(f":{v}")
        if k in ("STRING3Q", "STRING3A", "STRING1Q", "STRING1A"):
            return self.literal()
        if v == "(":
            return self.collection()
        if v == "[":
            return self.bnode_property_list()
        if v == "{":
            return self.formula()
        raise N3ParseError(f"unexpected token {v!r}", self.i, ln)

    def literal(self) -> str:
        k, v, _ = self.next()
        if k in ("STRING3Q", "STRING3A"):
            raw = v[3:-3]
        else:
            raw = v[1:-1]
        lex = _unescape(raw)
        esc = lex.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")
        nk, nv, _ = self.peek()
        if nk == "ATWORD" and re.fullmatch(r"@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*", nv):
            self.next()
            return f'"{esc}"{nv.lower()}'
        if nk == "CARETS":
            self.next()
            dt = self.term()
            if not dt.startswith("<"):
                raise N3ParseError(f"bad datatype {dt!r}")
            iri = dt[1:-1]
            if iri.startswith(XSD):
                return self._typed(esc, iri[len(XSD):])
            return f'"{esc}"^^{dt}'
        return f'"{esc}"'

    def collection(self) -> str:
        self.expect("(")
        elems = []
        while self.peek()[1] != ")":
            elems.append(self.path())
        self.expect(")")
        if not elems:
            return RDF_NIL
        head = self.new_bnode()
        cur = head
        for idx, e in enumerate(elems):
            self.emit(cur, RDF_FIRST, e)
            if idx + 1 < len(elems):
                nxt = f"{head}_{idx + 1}"  # ladder ids "<head>_<ndx>" (list.rb:396 contract)
                self.emit(cur, RDF_REST, nxt)
                cur = nxt
            else:
                self.emit(cur, RDF_REST, RDF_NIL)
        return head

    def bnode_property_list(self) -> str:
        self.expect("[")
        node = self.new_bnode()
        if self.peek()[1] != "]":
            self.predicate_object_list(node)
        self.expect("]")
        return node

    def formula(self) -> str:
        self.expect("{")
        self.form_counter += 1
        node = f"_:form_{self.form_counter}"
        self.scope = _Scope(node, self.scope)
        while self.peek()[1] != "}":
            k, v, _ = self.peek()
            if k == "ATWORD" and v in ("@prefix", "@base", "@forAll", "@forSome", "@keywords"):
                self.directive(v)
            else:
                self.triples()
            if self.peek()[1] == ".":
                self.next()
            elif self.peek()[1] != "}":
                raise N3ParseError(f"expected '.' or '}}' in formula, got {self.peek()[1]!r}")
        self.expect("}")
        self.scope = self.scope.parent
        return node


def parse_n3(
    text: str, base_uri: str = "", list_terms: bool = False,
    validate: bool = False, canonicalize: bool = False,
) -> list[tuple[str, str, str, str]]:
    """Parse an N3/Turtle document → list of (s, p, o, g) quads."""
    return N3Parser(text, base_uri=base_uri, list_terms=list_terms,
                    validate=validate, canonicalize=canonicalize).parse()


def parse_n3_full(
    text: str, base_uri: str = ""
) -> tuple[list[tuple[str, str, str, str]], set[str]]:
    """Parse returning (quads, universals) — universals are the terms
    declared by @forAll, which the reasoner treats as variables."""
    p = N3Parser(text, base_uri=base_uri)
    quads = p.parse()
    return quads, set(p.universals)


def term_kind(t: str) -> str:
    """Classify an encoded term: iri | bnode | literal | var."""
    if t.startswith("<"):
        return "iri"
    if t.startswith("_:"):
        return "bnode"
    if t.startswith('"'):
        return "literal"
    if t.startswith("?"):
        return "var"
    return "unknown"


def literal_parts(t: str) -> tuple[str, str, str]:
    """Split an encoded literal into (lexical, datatype-IRI, lang)."""
    if not t.startswith('"'):
        return t, "", ""
    m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9\-]+))?$', t, re.S)
    if not m:
        return t, "", ""
    lex = m.group(1)
    # single left-to-right pass: sequential str.replace would corrupt
    # adjacent escapes (encoded "\\n" — a backslash then 'n' — must not
    # become a newline)
    lex = re.sub(
        r"\\(.)",
        lambda mm: {"n": "\n", "r": "\r", "t": "\t"}.get(mm.group(1), mm.group(1)),
        lex,
    )
    return lex, m.group(2) or "", (m.group(3) or "").lower()
