"""The N3 builtin vocabulary (math/string/time/list/log) — pure Python.

Fresh implementations of the 75-entry predicate dispatch table the
reference exposes (behavioral spec: SURVEY.md §2.8; reference
lib/rdf/n3/algebra.rb:118-206 and the per-op files cited per entry).
These run driver-side during rule evaluation and inside per-document
pandas-UDF reasoning — rules are small, so this is never the
distributed hot path. The distributed equivalents (Column expressions)
live in rdf_n3_spark/functions/sql_builtins.py.

Calling convention (mirrors ListOperator/ResourceOperator skeletons,
list_operator.rb:19-50, resource_operator.rb:19-71):

    fn(subj_value, obj_value) -> result

Each builtin is registered as (mode, fn) where mode describes how the
rule engine binds it:
    "compute"  — value = f(subject); object may be var (bind) or ground
                 (compare-and-filter)
    "compute2" — subject is a 2+-element list; value = f(*elements)
    "test"     — boolean over (subject, object)
    "enum"     — yields values for an unbound variable side
Values flow as *encoded terms* (see n3_parser docstring); numeric
coercion follows extensions.rb:90-99 (string → number, permissive).
"""

from __future__ import annotations

import math as _math
import re
from datetime import datetime, timezone
from decimal import Decimal

from rdf_n3_spark.functions.n3_parser import XSD, literal_parts

MATH = "http://www.w3.org/2000/10/swap/math#"
STR = "http://www.w3.org/2000/10/swap/string#"
TIME = "http://www.w3.org/2000/10/swap/time#"
LIST = "http://www.w3.org/2000/10/swap/list#"
LOG = "http://www.w3.org/2000/10/swap/log#"


# ------------------------------------------------------------- coercion

def as_number(term: str):
    """Permissive numeric coercion (extensions.rb:90-99 behavior):
    literal lexical classified as int / decimal / double; non-numeric → 0."""
    lex, dt, _ = literal_parts(term)
    s = lex.strip()
    if re.fullmatch(r"[+-]?\d+", s):
        return int(s)
    if re.fullmatch(r"[+-]?(?:\d*\.\d+|\d+\.\d*)", s):
        return Decimal(s)
    if re.fullmatch(r"[+-]?(?:\d+\.?\d*|\.\d+)[eE][+-]?\d+", s):
        return float(s)
    return 0


def as_string(term: str) -> str:
    if isinstance(term, str) and term.startswith("<") and term.endswith(">"):
        return term[1:-1]  # IRI → its text (xsd:string cast semantics)
    lex, _, _ = literal_parts(term)
    return lex


def enc_number(v) -> str:
    if isinstance(v, bool):
        return f'"{"true" if v else "false"}"^^<{XSD}boolean>'
    if isinstance(v, int):
        return f'"{v}"^^<{XSD}integer>'
    if isinstance(v, Decimal):
        # format(..., 'f'): Decimal.normalize alone yields exponent
        # notation for trailing zeros (Decimal('100.0').normalize() ==
        # Decimal('1E+2')), which is not a valid xsd:decimal lexical
        return f'"{format(v.normalize(), "f")}"^^<{XSD}decimal>'
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f'"{v:.1f}"^^<{XSD}double>'
        return f'"{v}"^^<{XSD}double>'
    raise TypeError(f"not a number: {v!r}")


def enc_string(s: str) -> str:
    esc = s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")
    return f'"{esc}"'


def enc_int(v: int) -> str:
    return f'"{int(v)}"^^<{XSD}integer>'


def _numeric_op(f):
    def run(*terms):
        vals = [as_number(t) for t in terms]
        # Decimal/int/float promotion
        if any(isinstance(v, float) for v in vals):
            vals = [float(v) for v in vals]
        elif any(isinstance(v, Decimal) for v in vals):
            vals = [Decimal(v) for v in vals]
        return enc_number(f(*vals))

    return run


def _numeric_test(f):
    def run(a, b):
        x, y = as_number(a), as_number(b)
        if isinstance(x, Decimal) or isinstance(y, Decimal):
            x, y = Decimal(str(x)), Decimal(str(y))
        return f(x, y)

    return run


def _float_fn(f):
    def run(t):
        return enc_number(float(f(float(as_number(t)))))

    return run


# ------------------------------------------------------------- datetime

_DT_RE = re.compile(
    r"^(\d{4,})(?:-(\d{2}))?(?:-(\d{2}))?(?:T(\d{2}):(\d{2})(?::(\d{2}(?:\.\d+)?))?)?"
    r"(Z|[+-]\d{2}:\d{2})?$"
)


def _dt_lex(term: str) -> str:
    lex, _, _ = literal_parts(term)
    return lex.strip()


def _pad_datetime(lex: str) -> datetime:
    """as_datetime coercion (extensions.rb:105-113): pad partial forms."""
    s = lex
    if re.fullmatch(r"\d{4,}", s):
        s += "-01-01"
    elif re.fullmatch(r"\d{4,}-\d{2}", s):
        s += "-01"
    if "T" not in s:
        s += "T00:00:00"
    if re.search(r"T\d{2}:\d{2}$", s):
        s += ":00"
    s = s.replace("Z", "+00:00")
    return datetime.fromisoformat(s)


# ------------------------------------------------------------- registry
# name → (mode, fn); modes documented in module docstring.

REGISTRY: dict[str, tuple[str, object]] = {}


def _reg(iri: str, mode: str, fn):
    REGISTRY[iri] = (mode, fn)


# --- math (forward direction; SURVEY §2.8 table 1)
_reg(MATH + "sum", "compute_list", _numeric_op(lambda *v: sum(v) if v else 0))
_reg(MATH + "product", "compute_list", _numeric_op(lambda *v: _math.prod(v) if v else 1))
_reg(MATH + "difference", "compute_list", _numeric_op(lambda a, b: a - b))
_reg(MATH + "quotient", "compute_list", _numeric_op(lambda a, b: a / b))
def _remainder(elems):
    """math:remainder — the reference VALIDATES the pair as integers
    (math/remainder.rb:27-31, non-integers → no solution) and computes
    Ruby ``%`` (floor-mod, sign of the divisor), which Python's ``%``
    matches exactly."""
    a, b = (as_number(e) for e in elems)
    if not (isinstance(a, int) and isinstance(b, int)) or b == 0:
        return None
    return enc_number(a % b)


_reg(MATH + "remainder", "compute_list_whole", _remainder)
def _exponentiation(elems):
    """0 ** negative is a division by zero — no solution in both
    registry layers (the distributed twin yields null there)."""
    a, b = (as_number(e) for e in elems)
    if a == 0 and b < 0:
        return None
    if any(isinstance(v, float) for v in (a, b)):
        a, b = float(a), float(b)
    elif any(isinstance(v, Decimal) for v in (a, b)):
        a, b = float(a), float(b)  # Decimal ** Decimal may raise; float matches the Column twin
    return enc_number(a ** b)


_reg(MATH + "exponentiation", "compute_list_whole", _exponentiation)
# floor division in BOTH layers. int pairs stay on exact int floor
# division (``//``); routing them through float true-division would
# lose exactness beyond 2^53. Only Decimal/float need the
# floor-of-true-division form (Decimal ``//`` truncates toward zero).
_reg(MATH + "integerQuotient", "compute_list",
     _numeric_op(lambda a, b: a // b if isinstance(a, int) and isinstance(b, int)
                 else int(_math.floor(a / b))))
# negation is self-inverse: object-ground + subject-var binds the
# subject with the same computation (resource_operator.rb:45-47)
_reg(MATH + "negation", "compute_invertible",
     (_numeric_op(lambda a: -a), _numeric_op(lambda a: -a)))
_reg(MATH + "absoluteValue", "compute", _numeric_op(abs))
# half-away-from-zero (Ruby Float#round semantics, math/rounded.rb)
_reg(MATH + "rounded", "compute",
     lambda t: enc_int(int(_math.copysign(
         _math.floor(abs(float(as_number(t))) + 0.5), float(as_number(t))))))
_reg(MATH + "ceiling", "compute", lambda t: enc_int(_math.ceil(float(as_number(t)))))
_reg(MATH + "floor", "compute", lambda t: enc_int(_math.floor(float(as_number(t)))))
# the trig/hyperbolic family is invertible in BOTH directions: the
# reference's object-variable branch computes the inverse function
# (resource_operator.rb:45-47; e.g. math/sin.rb binds subject=asin(obj))
for _fwd, _inv in (("sin", "asin"), ("cos", "acos"), ("tan", "atan"),
                   ("sinh", "asinh"), ("cosh", "acosh"), ("tanh", "atanh")):
    _reg(MATH + _fwd, "compute_invertible",
         (_float_fn(getattr(_math, _fwd)), _float_fn(getattr(_math, _inv))))
    _reg(MATH + _inv, "compute_invertible",
         (_float_fn(getattr(_math, _inv)), _float_fn(getattr(_math, _fwd))))
_reg(MATH + "equalTo", "test", _numeric_test(lambda a, b: a == b))
_reg(MATH + "notEqualTo", "test", _numeric_test(lambda a, b: a != b))
_reg(MATH + "greaterThan", "test", _numeric_test(lambda a, b: a > b))
_reg(MATH + "lessThan", "test", _numeric_test(lambda a, b: a < b))
_reg(MATH + "notGreaterThan", "test", _numeric_test(lambda a, b: a <= b))
_reg(MATH + "notLessThan", "test", _numeric_test(lambda a, b: a >= b))
_reg(MATH + "memberCount", "compute_list_whole", lambda elems: enc_int(len(elems)))

# --- string (SURVEY §2.8 table 2)
_reg(STR + "concatenation", "compute_list_whole",
     lambda elems: enc_string("".join(as_string(e) for e in elems)))
_reg(STR + "contains", "test", lambda a, b: as_string(b) in as_string(a))
_reg(STR + "containsIgnoringCase", "test",
     lambda a, b: as_string(b).lower() in as_string(a).lower())
_reg(STR + "startsWith", "test", lambda a, b: as_string(a).startswith(as_string(b)))
_reg(STR + "endsWith", "test", lambda a, b: as_string(a).endswith(as_string(b)))
_reg(STR + "equalIgnoringCase", "test",
     lambda a, b: as_string(a).lower() == as_string(b).lower())
_reg(STR + "notEqualIgnoringCase", "test",
     lambda a, b: as_string(a).lower() != as_string(b).lower())
_reg(STR + "greaterThan", "test", lambda a, b: as_string(a) > as_string(b))
_reg(STR + "lessThan", "test", lambda a, b: as_string(a) < as_string(b))
_reg(STR + "notGreaterThan", "test", lambda a, b: as_string(a) <= as_string(b))
_reg(STR + "notLessThan", "test", lambda a, b: as_string(a) >= as_string(b))
_reg(STR + "matches", "test", lambda a, b: re.search(as_string(b), as_string(a)) is not None)
_reg(STR + "notMatches", "test", lambda a, b: re.search(as_string(b), as_string(a)) is None)
# literal (non-regex) replace: the reference passes the old string to
# gsub as a plain String, i.e. cwm's plain-replace semantics (str/replace.rb)
_reg(STR + "replace", "compute_list_whole",
     lambda elems: enc_string(
         as_string(elems[0]).replace(as_string(elems[1]), as_string(elems[2]))))
_reg(STR + "scrape", "compute_list_whole",
     lambda elems: (lambda m: enc_string(m.group(1)) if m else None)(
         re.search(as_string(elems[1]), as_string(elems[0]))))
_reg(STR + "format", "compute_list_whole",
     lambda elems: enc_string(as_string(elems[0]) % tuple(as_string(e) for e in elems[1:])))


def _ws_collapse(s: str) -> str:
    return " ".join(s.split())


# cwm's string:containsRoughly: substring test ignoring case and
# whitespace runs (semantics pinned by examples/string/roughly-out.n3;
# the reference raises NotImplemented here, algebra.rb:178 — this
# engine implements the cwm behavior instead)
_reg(STR + "containsRoughly", "test",
     lambda a, b: _ws_collapse(as_string(b)).lower()
     in _ws_collapse(as_string(a)).lower())

#: safe sets derived from cwm's uriEncode goldens
#: (examples/string/uriEncode-out.n3): encodeForURI keeps RFC reserved
#: chars EXCEPT "/", encodeForFragID keeps "/" but encodes #'()~
_ALNUM = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
          "abcdefghijklmnopqrstuvwxyz0123456789")
URI_SAFE = set(_ALNUM + "_.-~" + "#!$&'()*+,;=:?@")
FRAG_SAFE = set(_ALNUM + "_.-" + "!$&*+,;=:@/")


def _pct_encode(s: str, safe: set) -> str:
    out = []
    for ch in s:
        if ch in safe:
            out.append(ch)
        else:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
    return "".join(out)


_reg(STR + "encodeForURI", "compute",
     lambda t: enc_string(_pct_encode(as_string(t), URI_SAFE)))
_reg(STR + "encodeForFragID", "compute",
     lambda t: enc_string(_pct_encode(as_string(t), FRAG_SAFE)))

# --- time (lexical-form-sensitive validity; SURVEY §2.8 table 3)

def _time_component(part_idx: int, need: str):
    def run(t):
        lex = _dt_lex(t)
        if not re.match(need, lex):
            return None  # invalid lexical form → no solution
        m = _DT_RE.match(lex)
        if not m or m.group(part_idx) is None:
            return None
        v = m.group(part_idx)
        return enc_int(int(float(v)))

    return run


_reg(TIME + "year", "compute", _time_component(1, r"^\d{4,}"))
_reg(TIME + "month", "compute", _time_component(2, r"^\d{4,}-\d{2}"))
_reg(TIME + "day", "compute", _time_component(3, r"^\d{4,}-\d{2}-\d{2}"))
_reg(TIME + "hour", "compute", _time_component(4, r"^\d{4,}-\d{2}-\d{2}T\d{2}"))
_reg(TIME + "minute", "compute", _time_component(5, r"^\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}"))
_reg(TIME + "second", "compute", _time_component(6, r"^\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"))


def _day_of_week(t):
    dt = _pad_datetime(_dt_lex(t))
    return enc_int((dt.weekday() + 1) % 7)  # 0 = Sunday


_reg(TIME + "dayOfWeek", "compute", _day_of_week)


def _timezone(t):
    m = re.search(r"([+-]\d{2}:\d{2})$", _dt_lex(t))
    return enc_string(m.group(1)) if m else None  # absent or 'Z' → invalid


_reg(TIME + "timeZone", "compute", _timezone)


def _in_seconds(t):
    dt = _pad_datetime(_dt_lex(t))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return enc_int(int(dt.timestamp()))


def _in_seconds_inverse(t):
    v = int(as_number(t))
    dt = datetime.fromtimestamp(v, tz=timezone.utc)
    return enc_string(dt.strftime("%Y-%m-%dT%H:%M:%SZ"))


_reg(TIME + "inSeconds", "compute_invertible", (_in_seconds, _in_seconds_inverse))


def _now_utc() -> datetime:
    """Clock hook — tests monkeypatch this for determinism."""
    return datetime.now(timezone.utc)


def _strftime_ruby(fmt: str, dt: datetime) -> str:
    """Ruby strftime subset: empty format → '%FT%T%:z' (gm_time.rb:21),
    and the '%:z' colon-offset directive Python lacks."""
    if fmt == "":
        fmt = "%FT%T%:z"
    off = dt.strftime("%z")
    fmt = fmt.replace("%:z", f"{off[:3]}:{off[3:]}" if off else "")
    return dt.strftime(fmt)


# subject = format string, value = current processing time formatted
# (time/gm_time.rb:17-27, local_time.rb:17-27). Non-deterministic by
# nature — the reference's tests don't assert values, and neither does
# the oracle gate; covered by pytest shape checks.
_reg(TIME + "gmTime", "compute",
     lambda t: enc_string(_strftime_ruby(as_string(t), _now_utc())))
_reg(TIME + "localTime", "compute",
     lambda t: enc_string(_strftime_ruby(as_string(t), _now_utc().astimezone())))

# --- log equality (same-term, not value-equality; log/equal_to.rb:30-32)
_reg(LOG + "equalTo", "test", lambda a, b: a == b)
_reg(LOG + "notEqualTo", "test", lambda a, b: a != b)

# --- list (handled specially by the rule engine — subject/object may be
#     list terms; registered here for dispatch-table completeness)
for _n in ("first", "last", "length", "append", "member", "in", "iterate"):
    _reg(LIST + _n, "list_special", _n)

# log control operators (implies/includes/conclusion/conjunction/
# outputString/parsedAsN3/n3String/dtlit/langlit) are rule-engine
# constructs, dispatched inside plans/reason.py.
LOG_SPECIAL = {
    LOG + n
    for n in (
        "implies", "includes", "notIncludes", "conclusion", "conjunction",
        "outputString", "parsedAsN3", "n3String", "dtlit", "langlit",
        "content", "semantics", "supports",
    )
}


def is_builtin(pred_iri: str) -> bool:
    return pred_iri in REGISTRY or pred_iri in LOG_SPECIAL
