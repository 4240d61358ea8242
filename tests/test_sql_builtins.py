"""Unit tests for the distributed builtin registry (sql_builtins), the
graph-level log: operators, and the list-ladder transforms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_n3_spark.functions.builtins import LIST, LOG, MATH, STR, TIME
from rdf_n3_spark.functions.sql_builtins import SQL_REGISTRY, apply_builtins
from rdf_n3_spark.operators.lists import NIL, contract_ladders, expand_list_column
from rdf_n3_spark.plans.graph_ops import graph_includes, graph_not_includes, output_strings


def test_registry_covers_survey_vocabularies():
    """Every §2.8 operator family is present in the distributed table."""
    iris = set(SQL_REGISTRY)
    for needed in (
        MATH + "sum", MATH + "difference", MATH + "product", MATH + "quotient",
        MATH + "remainder", MATH + "exponentiation", MATH + "negation",
        MATH + "absoluteValue", MATH + "rounded", MATH + "ceiling", MATH + "floor",
        MATH + "sin", MATH + "acos", MATH + "tanh", MATH + "asinh",
        MATH + "greaterThan", MATH + "notLessThan",
        STR + "concatenation", STR + "contains", STR + "containsIgnoringCase",
        STR + "startsWith", STR + "endsWith", STR + "equalIgnoringCase",
        STR + "greaterThan", STR + "matches", STR + "notMatches",
        STR + "replace", STR + "scrape", STR + "format",
        STR + "containsRoughly", STR + "encodeForURI", STR + "encodeForFragID",
        TIME + "year", TIME + "month", TIME + "day", TIME + "hour",
        TIME + "minute", TIME + "second", TIME + "dayOfWeek",
        TIME + "timeZone", TIME + "inSeconds",
        TIME + "gmTime", TIME + "localTime",
        LIST + "first", LIST + "last", LIST + "length", LIST + "append",
        LIST + "member", LIST + "in", LIST + "iterate",
        LOG + "equalTo", LOG + "notEqualTo",
    ):
        assert needed in iris, needed


def test_chained_bind_scheduling(spark):
    """A builtin whose input is bound by a LATER-listed builtin still
    runs (the reference's rank re-sort, formula.rb:163-185)."""
    df = spark.createDataFrame([("4", "9")], ["a", "b"])
    out = apply_builtins(df, [
        ("?d", MATH + "absoluteValue", "?ad"),       # needs ?d — deferred
        (("?a", "?b"), MATH + "difference", "?d"),   # binds ?d
    ]).collect()[0]
    assert out["d"] == -5.0 and out["ad"] == 5.0


def test_unresolvable_raises(spark):
    df = spark.createDataFrame([("1",)], ["a"])
    with pytest.raises(ValueError, match="never bound"):
        apply_builtins(df, [("?nope", MATH + "absoluteValue", "?x")])


def test_compute_compare_filters(spark):
    """Ground object → compare-and-filter (resource_operator.rb:63-69)."""
    df = spark.createDataFrame([("2",), ("3",)], ["a"])
    rows = apply_builtins(df, [("?a", MATH + "negation", "-2")]).collect()
    assert [r["a"] for r in rows] == ["2"]


def test_n3_quoted_literal_decoding(spark):
    """The codec accepts N3-quoted literals as well as bare lexicals."""
    df = spark.createDataFrame(
        [('"12"^^<http://www.w3.org/2001/XMLSchema#integer>', "30")], ["a", "b"]
    )
    out = apply_builtins(df, [(("?a", "?b"), MATH + "sum", "?s")]).collect()[0]
    assert out["s"] == 42.0


def test_log_equal_is_term_identity(spark):
    """log:equalTo compares encoded terms, not values: '"1"' ≠ '1'."""
    df = spark.createDataFrame([('"1"', "1")], ["a", "b"])
    assert apply_builtins(df, [("?a", LOG + "equalTo", "?b")]).count() == 0
    assert apply_builtins(df, [("?a", MATH + "equalTo", "?b")]).count() == 1


def test_list_member_and_in(spark):
    df = spark.createDataFrame([(["x", "y"],)], ["arr"])
    rows = apply_builtins(df, [("?arr", LIST + "member", "?m")]).collect()
    assert {r["m"] for r in rows} == {"x", "y"}
    assert apply_builtins(df, [("y", LIST + "in", "?arr")]).count() == 1
    assert apply_builtins(df, [("z", LIST + "in", "?arr")]).count() == 0


def test_scrape_requires_constant_pattern(spark):
    df = spark.createDataFrame([("abc", "a")], ["t", "p"])
    with pytest.raises(ValueError, match="constant pattern"):
        apply_builtins(df, [(("?t", "?p"), STR + "scrape", "?x")])


def test_time_validity_is_lexical(spark):
    """'2024' has no day component even though a parsed date would
    (time/day.rb:29-32 lexical regex)."""
    df = spark.createDataFrame([("2024",), ("2024-03-07",)], ["t"])
    rows = apply_builtins(df, [("?t", TIME + "day", "?d")]).collect()
    by = {r["t"]: r["d"] for r in rows}
    assert by["2024"] is None and by["2024-03-07"] == 7


def test_backward_inverse_mode(spark):
    """Unbound SUBJECT + ground object → inverse bind
    (resource_operator.rb:45-47)."""
    df = spark.createDataFrame([("row",)], ["k"])
    out = apply_builtins(df, [
        ("?x", MATH + "negation", "5"),
        ("?t", TIME + "inSeconds", "1700000000"),
    ]).collect()[0]
    assert out["x"] == -5.0
    assert out["t"] == "2023-11-14T22:13:20Z"


def test_backward_trig_both_directions(spark):
    """math:sin with ground OBJECT binds the subject via asin, and
    math:asin inverts via sin — in the distributed layer AND the
    driver registry (math/sin.rb object-var branch)."""
    import math

    df = spark.createDataFrame([("row",)], ["k"])
    out = apply_builtins(df, [
        ("?x", MATH + "sin", "0.5"),
        ("?y", MATH + "asin", "0.5"),
    ]).collect()[0]
    assert abs(out["x"] - math.asin(0.5)) < 1e-12
    assert abs(out["y"] - math.sin(0.5)) < 1e-12

    from rdf_n3_spark.functions.builtins import REGISTRY

    mode, (fwd, inv) = REGISTRY[MATH + "sin"]
    assert mode == "compute_invertible"
    assert f'"{math.asin(0.5)}"' in inv("0.5")


def test_string_format_distributed(spark):
    """string:format — Python % semantics via an Arrow-batched pandas
    UDF twin of the driver registry (str/format.rb:12-15)."""
    df = spark.createDataFrame([("en", "web")], ["lang", "src"])
    out = apply_builtins(df, [
        (("doc %s in %s", "?src", "?lang"), STR + "format", "?f"),
    ]).collect()[0]
    assert out["f"] == "doc web in en"


def test_contains_roughly_distributed(spark):
    """cwm whitespace/case-insensitive contains — golden cases from
    examples/string/roughly-out.n3."""
    df = spark.createDataFrame(
        [("A green party", "green     Party", True),
         ("all good people to come to", "gooood", False),
         ("", "", True),
         ("THE\n\tWIDE     \n\tAND\n\tTHE\n\tnarrowEST\n\tOF PLACES",
          "wide and the", True)],
        ["a", "b", "want"],
    )
    out = apply_builtins(df.where("want"), [("?a", STR + "containsRoughly", "?b")])
    assert out.count() == 3
    out2 = apply_builtins(df.where("NOT want"), [("?a", STR + "containsRoughly", "?b")])
    assert out2.count() == 0


def test_uri_encode_distributed(spark):
    """Percent-encoding safe sets pinned by examples/string/uriEncode-out.n3
    — both layers agree."""
    from rdf_n3_spark.functions.builtins import REGISTRY

    cases = {  # input → (AS_URI, AS_FragID) per the cwm golden
        "asd#jkl": ("asd#jkl", "asd%23jkl"),
        "asd/jkl": ("asd%2Fjkl", "asd/jkl"),
        "asd~jkl": ("asd~jkl", "asd%7Ejkl"),
        "asd'jkl": ("asd'jkl", "asd%27jkl"),
        "asd-jkl": ("asd-jkl", "asd-jkl"),
    }
    df = spark.createDataFrame([(k,) for k in cases], ["s"])
    rows = apply_builtins(df, [
        ("?s", STR + "encodeForURI", "?u"),
        ("?s", STR + "encodeForFragID", "?f"),
    ]).collect()
    for r in rows:
        want_u, want_f = cases[r["s"]]
        assert r["u"] == want_u and r["f"] == want_f, r
    for k, (want_u, want_f) in cases.items():
        _, fn_u = REGISTRY[STR + "encodeForURI"]
        _, fn_f = REGISTRY[STR + "encodeForFragID"]
        assert fn_u(f'"{k}"') == f'"{want_u}"'
        assert fn_f(f'"{k}"') == f'"{want_f}"'


def test_gm_time_distributed(spark):
    """time:gmTime binds the (query-constant) processing time formatted
    per the strftime subject (gm_time.rb:17-27); shape-checked — the
    value is by nature non-deterministic."""
    import re as _re

    df = spark.createDataFrame([("row",)], ["k"])
    out = apply_builtins(df, [
        ("%Y", TIME + "gmTime", "?y"),
        ("", TIME + "localTime", "?iso"),
    ]).collect()[0]
    assert _re.fullmatch(r"\d{4}", out["y"])
    assert "T" in out["iso"] and _re.search(r"[+-]\d{2}:\d{2}$", out["iso"])


def test_gm_time_driver(monkeypatch):
    """Driver twin with a pinned clock: exact Ruby-strftime output,
    including the %:z colon offset and the empty-format ISO default."""
    from datetime import datetime, timezone

    import rdf_n3_spark.functions.builtins as B

    fixed = datetime(2024, 3, 7, 12, 30, 0, tzinfo=timezone.utc)
    monkeypatch.setattr(B, "_now_utc", lambda: fixed)
    _, fn = B.REGISTRY[TIME + "gmTime"]
    assert fn('"%Y-%m-%d"') == '"2024-03-07"'
    assert fn('""') == '"2024-03-07T12:30:00+00:00"'


def test_dtlit_langlit(spark):
    df = spark.createDataFrame([("chat", "en")], ["w", "l"])
    out = apply_builtins(df, [
        (("?w", "<http://www.w3.org/2001/XMLSchema#string>"), LOG + "dtlit", "?t"),
        (("?w", "?l"), LOG + "langlit", "?g"),
    ]).collect()[0]
    assert out["t"] == '"chat"^^<http://www.w3.org/2001/XMLSchema#string>'
    assert out["g"] == '"chat"@en'


def test_graph_includes_and_not(spark):
    quads = spark.createDataFrame(
        [("a", "p", "1", "g1"), ("a", "q", "2", "g1"), ("b", "p", "1", "g2")],
        ["s", "p", "o", "g"],
    )
    inc = graph_includes(quads, [("?x", "p", "1"), ("?x", "q", "?y")])
    assert [r["g"] for r in inc.collect()] == ["g1"]
    ninc = graph_not_includes(quads, [("?x", "p", "1"), ("?x", "q", "?y")])
    assert [r["g"] for r in ninc.collect()] == ["g2"]


def test_graph_includes_joins_shared_vars_per_graph(spark):
    """Variables shared BETWEEN patterns must bind consistently within
    a graph (includes.rb:57-58 runs the object formula as one BGP):
    a graph matching each pattern separately but with no joined
    solution must NOT pass."""
    quads = spark.createDataFrame(
        [
            ("a", "p", "1", "g1"), ("b", "q", "2", "g1"),   # disjoint matches
            ("c", "p", "1", "g2"), ("c", "q", "9", "g2"),   # joined solution
        ],
        ["s", "p", "o", "g"],
    )
    pats = [("?x", "p", "1"), ("?x", "q", "?y")]
    assert [r["g"] for r in graph_includes(quads, pats).collect()] == ["g2"]
    assert [r["g"] for r in graph_not_includes(quads, pats).collect()] == ["g1"]


def test_graph_includes_independent_components_intersect(spark):
    """Patterns with no shared variables stay independent containment
    tests (cheap distinct-g scans), intersected across components."""
    quads = spark.createDataFrame(
        [
            ("a", "p", "1", "g1"), ("z", "r", "7", "g1"),
            ("a", "p", "1", "g2"),
        ],
        ["s", "p", "o", "g"],
    )
    pats = [("?x", "p", "1"), ("?w", "r", "?v")]
    assert [r["g"] for r in graph_includes(quads, pats).collect()] == ["g1"]


def test_rounded_half_away_from_zero(spark):
    """Ruby Float#round semantics (math/rounded.rb): -2.5 → -3."""
    df = spark.createDataFrame([("-2.5",), ("2.5",), ("-0.3",)], ["a"])
    rows = apply_builtins(df, [("?a", MATH + "rounded", "?r")]).collect()
    by = {r["a"]: r["r"] for r in rows}
    assert by == {"-2.5": -3, "2.5": 3, "-0.3": 0}

    from rdf_n3_spark.functions.builtins import REGISTRY

    _, fn = REGISTRY[MATH + "rounded"]
    assert fn("-2.5") == '"-3"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert fn("2.5") == '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_fixpoint_per_graph_applies_builtins(spark):
    """A rule carrying builtin constraints must filter per-graph
    closure solutions too (not over-derive)."""
    from rdf_n3_spark.plans.bgp import Rule, fixpoint_per_graph

    quads = spark.createDataFrame(
        [("e1", ":n", "3", "g1"), ("e2", ":n", "9", "g1"), ("e3", ":n", "7", "g2")],
        ["s", "p", "o", "g"],
    )
    rule = Rule(
        antecedent=(("?e", ":n", "?c"),),
        consequent=(("?e", ":big", "?c"),),
        builtins=(("?c", MATH + "greaterThan", "5"),),
    )
    got = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in fixpoint_per_graph(quads, [rule]).where(F.col("inferred")).collect()
    }
    assert got == {("e2", ":big", "9", "g1"), ("e3", ":big", "7", "g2")}


def test_graph_includes_repeated_var(spark):
    """A variable repeated inside one pattern forces same-row equality."""
    quads = spark.createDataFrame(
        [("a", "p", "a", "g1"), ("a", "p", "b", "g2")], ["s", "p", "o", "g"]
    )
    inc = graph_includes(quads, [("?x", "p", "?x")])
    assert [r["g"] for r in inc.collect()] == ["g1"]


def test_output_strings_ordering(spark):
    df = spark.createDataFrame(
        [("c1", 1, "b"), ("c1", 0, "a"), ("c0", 0, "z")], ["k", "i", "v"]
    )
    rows = output_strings(df, "k", "v", "i").collect()
    assert [(r["k"], r["out"]) for r in rows] == [("c0", "z"), ("c1", "a\nb")]


def test_ladder_roundtrip(spark):
    df = spark.createDataFrame([("h1", ["a", "b", "c"]), ("h2", ["x"])], ["head", "items"])
    ladder = expand_list_column(df, "head", "items")
    rows = {(r["s"], r["p"]): r["o"] for r in ladder.collect()}
    # cell ids are deterministic (list.rb:396 shape) with a reserved
    # separator so heads ending in _<digits> can't collide
    assert rows[("h1", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>")] == "a"
    assert rows[("h1#_1", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>")] == "b"
    assert rows[("h1#_2", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>")] == NIL
    assert rows[("h2", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>")] == NIL
    back = {r["head"]: r["items"] for r in contract_ladders(ladder).collect()}
    assert back == {"h1": ["a", "b", "c"], "h2": ["x"]}


def test_ladder_roundtrip_heads_ending_in_digits(spark):
    """Heads that themselves end in _<digits> (the repo's own skolem-id
    scheme, e.g. ent:part_4) must not merge or shift positions."""
    df = spark.createDataFrame(
        [("ent:part_4", ["a", "b"]), ("ent:part", ["x", "y"]), ("h", ["p"]), ("h_1", ["q"])],
        ["head", "items"],
    )
    ladder = expand_list_column(df, "head", "items")
    back = {r["head"]: r["items"] for r in contract_ladders(ladder).collect()}
    assert back == {
        "ent:part_4": ["a", "b"],
        "ent:part": ["x", "y"],
        "h": ["p"],
        "h_1": ["q"],
    }


def test_rule_with_builtin_filter(spark):
    from rdf_n3_spark.plans.bgp import Rule, apply_rule

    triples = spark.createDataFrame(
        [("e1", ":n", "3"), ("e2", ":n", "9")], ["s", "p", "o"]
    )
    rule = Rule(
        antecedent=(("?e", ":n", "?c"),),
        consequent=(("?e", ":big", "?c"),),
        builtins=(("?c", MATH + "greaterThan", "5"),),
    )
    rows = apply_rule(triples, rule).collect()
    assert [(r["s"], r["p"], r["o"]) for r in rows] == [("e2", ":big", "9")]
