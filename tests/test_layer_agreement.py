"""Two-layer agreement: every math builtin must produce the SAME value
through the driver registry (term-faithful Python, used in per-document
rule evaluation) and the distributed registry (Column expressions, used
on the corpus hot path) — a silent divergence would make per-document
and corpus-scale reasoning disagree on the same data.

Deterministic grid: signed integers, decimals, halves (rounding
boundaries), and magnitude extremes. "No solution" must align too: the
driver filters (returns None) exactly where the distributed layer binds
null — e.g. math:remainder on non-integer operands or a zero divisor
(the reference validates the pair as integers, math/remainder.rb).
"""

from __future__ import annotations

import pytest

from rdf_n3_spark.functions.builtins import MATH, REGISTRY, as_number, literal_parts
from rdf_n3_spark.functions.sql_builtins import apply_builtins

# "2.0"/"4.0": whole-VALUED decimal lexicals — the reference types them
# Decimal, so integer-validated ops (math:remainder) must reject them
# in BOTH layers; gating on value-integrality instead of the lexical
# form would silently accept them in the distributed layer only.
VALUES = ["0", "1", "-1", "2", "-2", "7", "-7", "2.5", "-2.5", "0.5",
          "-0.5", "3.25", "-3.25", "1000000", "-999999", "0.001",
          "2.0", "4.0", "-6.0"]

PAIR_OPS = ["difference", "quotient", "remainder", "integerQuotient",
            "exponentiation", "sum", "product"]
UNARY_OPS = ["negation", "absoluteValue", "rounded", "ceiling", "floor"]


def _driver_value(op: str, args: list[str]) -> float | None:
    """Driver-layer result as a float, or None for 'no solution'."""
    mode, fn = REGISTRY[MATH + op]
    try:
        if mode in ("compute", "compute_invertible"):
            f = fn[0] if mode == "compute_invertible" else fn
            enc = f(args[0])
        else:
            enc = fn(args) if mode == "compute_list_whole" else fn(*args)
    except (ArithmeticError, OverflowError, ValueError):
        return None
    if enc is None:
        return None
    lex, _, _ = literal_parts(enc)
    return float(as_number(f'"{lex}"'))


def test_math_layers_agree(spark):
    rows, expected = [], []
    rid = 0
    for op in PAIR_OPS:
        for a in VALUES:
            for b in VALUES:
                if op in ("quotient", "integerQuotient") and float(b) == 0:
                    continue  # driver filters; distributed: inf / null
                if op == "exponentiation" and (float(a) < 0 or abs(float(b)) > 8):
                    continue  # complex results / overflow out of scope
                rows.append((rid, op, a, b))
                expected.append(_driver_value(op, [a, b]))
                rid += 1
    for op in UNARY_OPS:
        for a in VALUES:
            rows.append((rid, op, a, a))
            expected.append(_driver_value(op, [a]))
            rid += 1

    df = spark.createDataFrame(rows, "id long, op string, a string, b string")
    got: dict[int, float | None] = {}
    for op in PAIR_OPS:
        sol = apply_builtins(df.where(df.op == op),
                             [(("?a", "?b"), MATH + op, "?v")])
        got.update({r["id"]: (None if r["v"] is None else float(r["v"]))
                    for r in sol.select("id", "v").collect()})
    for op in UNARY_OPS:
        sol = apply_builtins(df.where(df.op == op), [("?a", MATH + op, "?v")])
        got.update({r["id"]: (None if r["v"] is None else float(r["v"]))
                    for r in sol.select("id", "v").collect()})

    bad = []
    for (rid_, op, a, b), want in zip(rows, expected):
        have = got.get(rid_)
        if want is None or have is None:
            if want is not have:
                bad.append((op, a, b, want, have))
        elif abs(have - want) > 1e-9 * max(1.0, abs(want)):
            bad.append((op, a, b, want, have))
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"


@pytest.mark.parametrize("op", ["greaterThan", "lessThan", "equalTo",
                                "notGreaterThan", "notLessThan", "notEqualTo"])
def test_comparison_layers_agree(spark, op):
    pairs = [(a, b) for a in VALUES for b in VALUES]
    mode, fn = REGISTRY[MATH + op]
    keep_driver = {(a, b) for a, b in pairs if fn(f'"{a}"', f'"{b}"')}
    df = spark.createDataFrame(pairs, "a string, b string")
    sol = apply_builtins(df, [("?a", MATH + op, "?b")])
    keep_dist = {(r["a"], r["b"]) for r in sol.collect()}
    assert keep_driver == keep_dist


TIME_LEX = ["2024", "2024-03", "2024-03-07", "2024-03-07T12:30",
            "2024-03-07T12:30:45", "2024-03-07T12:30:45Z",
            "2024-03-07T12:30:45+02:00", "not-a-date", "2024-3-7",
            "0999-01-01T00:00:00", "2024-02-29T00:00:00", "",
            "2024-03-07T00:30:00+02:00"]
TIME_OPS = ["year", "month", "day", "hour", "minute", "second",
            "dayOfWeek", "timeZone", "inSeconds"]


def test_time_layers_agree(spark):
    """Time builtins over valid/partial/malformed/offset lexicals:
    identical values and aligned no-solution in both layers. Also the
    robustness contract: a malformed lexical yields null — it must
    never raise the ANSI CAST_INVALID_INPUT error that would kill a
    distributed job on one bad row."""
    from rdf_n3_spark.functions.builtins import TIME

    def drv(op, lex_):
        mode, fn = REGISTRY[TIME + op]
        f = fn[0] if mode == "compute_invertible" else fn
        try:
            enc = f(f'"{lex_}"')
        except Exception:
            return None
        if enc is None:
            return None
        l, _, _ = literal_parts(enc)
        return l

    df = spark.createDataFrame([(l,) for l in TIME_LEX], ["lex"])
    bad = []
    for op in TIME_OPS:
        sol = apply_builtins(df, [("?lex", TIME + op, "?v")])
        dist = {r["lex"]: (None if r["v"] is None else str(r["v"]))
                for r in sol.collect()}
        for l in TIME_LEX:
            d, x = drv(op, l), dist.get(l)
            if (d is None) != (x is None) or (d is not None and str(d) != str(x)):
                bad.append((op, l, d, x))
    assert not bad, f"{len(bad)} divergences: {bad[:5]}"


STR_TEXTS = ["", "abc", "ABC", "aBc", "Straße", "STRASSE", "İstanbul",
             "istanbul", "ﬁle", "a b  c", "a\tb", "naïve", "NAÏVE",
             "x.y*z", "résumé", "𝒜bc"]
STR_TESTS = ["contains", "containsIgnoringCase", "startsWith", "endsWith",
             "equalIgnoringCase", "greaterThan", "lessThan", "containsRoughly"]


def test_string_layers_agree(spark):
    """String tests/encoders over Unicode case-folding edge cases
    (dotted I, sharp s, ligatures, astral chars): identical keep-sets
    and encoder outputs in both layers."""
    from rdf_n3_spark.functions.builtins import STR, enc_string

    pairs = [(a, b) for a in STR_TEXTS for b in STR_TEXTS]
    df = spark.createDataFrame(pairs, "a string, b string")
    bad = []
    for op in STR_TESTS:
        _, fn = REGISTRY[STR + op]
        keep_driver = {(a, b) for a, b in pairs if fn(enc_string(a), enc_string(b))}
        sol = apply_builtins(df, [("?a", STR + op, "?b")])
        keep_dist = {(r["a"], r["b"]) for r in sol.collect()}
        bad.extend((op, p) for p in keep_driver ^ keep_dist)

    dfa = spark.createDataFrame([(t,) for t in STR_TEXTS], ["a"])
    for op in ("encodeForURI", "encodeForFragID"):
        _, fn = REGISTRY[STR + op]
        want = {t: literal_parts(fn(enc_string(t)))[0] for t in STR_TEXTS}
        sol = apply_builtins(dfa, [("?a", STR + op, "?v")])
        got = {r["a"]: r["v"] for r in sol.collect()}
        bad.extend((op, t, want[t], got.get(t)) for t in STR_TEXTS if want[t] != got.get(t))
    assert not bad, f"{len(bad)} divergences: {bad[:5]}"


TRIG_VALS = ["0", "0.5", "-0.5", "1", "-1", "2", "-2", "10", "-10",
             "0.999", "1.001", "1000"]
TRIG_OPS = ["sin", "cos", "tan", "sinh", "cosh", "tanh",
            "asin", "acos", "atan", "asinh", "acosh", "atanh"]


def test_trig_layers_agree(spark):
    """Trig family incl. out-of-domain (asin 2, acosh 0.5, atanh ±1)
    and overflow (sinh 1000): value agreement, and the distributed
    layer must bind null — never NaN/Inf — exactly where the driver
    raises and filters."""
    df = spark.createDataFrame([(v,) for v in TRIG_VALS], ["a"])
    bad = []
    for op in TRIG_OPS:
        mode, fn = REGISTRY[MATH + op]
        f = fn[0] if mode == "compute_invertible" else fn
        want = {}
        for v in TRIG_VALS:
            try:
                want[v] = float(as_number('"%s"' % literal_parts(f(f'"{v}"'))[0]))
            except Exception:
                want[v] = None
        sol = apply_builtins(df, [("?a", MATH + op, "?x")])
        got = {r["a"]: r["x"] for r in sol.collect()}
        for v in TRIG_VALS:
            w, g = want[v], got.get(v)
            if g is not None and g != g:
                bad.append((op, v, "NaN bound"))
            elif (w is None) != (g is None):
                bad.append((op, v, w, g))
            elif w is not None and abs(g - w) > 1e-9 * max(1.0, abs(w)):
                bad.append((op, v, w, g))
    assert not bad, f"{len(bad)} divergences: {bad[:6]}"


def test_list_ops_tolerate_empty_lists(spark):
    """list:first/last on an EMPTY list: null (no solution, like the
    driver's empty result) — ANSI element_at would raise mid-job."""
    from rdf_n3_spark.functions.builtins import LIST

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["x"]), (3, [])],
        "id long, arr array<string>",
    )
    first = {r["id"]: r["v"] for r in
             apply_builtins(df, [("?arr", LIST + "first", "?v")]).collect()}
    last = {r["id"]: r["v"] for r in
            apply_builtins(df, [("?arr", LIST + "last", "?v")]).collect()}
    assert first == {1: "a", 2: "x", 3: None}
    assert last == {1: "c", 2: "x", 3: None}


def test_non_numeric_lexicals_coerce_to_zero(spark):
    """Permissive numeric coercion (extensions.rb:90-99): a malformed
    numeric lexical is 0, never a job-killing ANSI cast error."""
    df = spark.createDataFrame([("abc",), ("12",), ("1.5e3",), ("",), ("12x",)], ["a"])
    sol = apply_builtins(df, [("?a", MATH + "negation", "?n")])
    got = {r["a"]: r["n"] for r in sol.collect()}
    assert got == {"abc": -0.0, "12": -12.0, "1.5e3": -1500.0, "": -0.0, "12x": -0.0}
    for a, n in got.items():
        want = float(as_number(f'"{a}"'))
        assert n == -want


def test_integer_ops_exact_beyond_double(spark):
    """integerQuotient / remainder on int64-scale operands: both
    layers must bind the EXACT integer (double-routed arithmetic
    drifts beyond 2^53) — compared as integers, never through float.
    Includes whitespace-padded lexicals (the driver's as_number strips
    before classifying, so the distributed gate must trim too)."""
    cases = [
        ("1152921504606846976", "7"),    # 2^60
        ("1152921504606846977", "7"),
        ("-1152921504606846977", "7"),   # negative: floor, sign of divisor
        ("1152921504606846977", "-7"),
        ("9007199254740993", "3"),       # 2^53 + 1 (first double gap)
        (" 7 ", " 3 "),                  # padded integer lexicals
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)], ["rid", "a", "b"])
    for op in ("integerQuotient", "remainder"):
        mode, fn = REGISTRY[MATH + op]
        sol = apply_builtins(df, [(("?a", "?b"), MATH + op, "?v")])
        dist = {r["rid"]: (None if r["v"] is None else int(r["v"]))
                for r in sol.collect()}
        for i, (a, b) in enumerate(cases):
            enc = fn([a, b]) if mode == "compute_list_whole" else fn(*[a, b])
            lex_, _, _ = literal_parts(enc)
            drv = int(lex_)
            # ground truth: Python's exact floor semantics
            pa, pb = int(a), int(b)
            truth = pa // pb if op == "integerQuotient" else pa % pb
            assert drv == truth, (op, i)
            assert dist[i] == truth, (op, i, dist[i], truth)


def test_integer_quotient_min_by_minus_one_survives(spark):
    """MIN // -1 = 2^63 does not fit a long: the distributed layer
    must yield null (no solution), never an ANSI overflow that kills
    the job. (The driver binds the exact Python bignum — a documented
    int64 representability boundary, not a silent wrong value.)"""
    df = spark.createDataFrame(
        [(0, "-9223372036854775808", "-1")], ["rid", "a", "b"])
    sol = apply_builtins(df, [(("?a", "?b"), MATH + "integerQuotient", "?v")])
    assert [r["v"] for r in sol.collect()] == [None]
