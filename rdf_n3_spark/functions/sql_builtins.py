"""Distributed (Column-expression) N3 builtin vocabulary.

The reference dispatches 75 builtin predicates by IRI and evaluates
them row-at-a-time in Ruby (lib/rdf/n3/algebra.rb:118-206; skeletons
ListOperator list_operator.rb:19-50 / ResourceOperator
resource_operator.rb:19-71).  This module is the *distributed* half of
that dispatch table: every operator that can be a JVM-side Column
expression is one, so builtin evaluation over millions of solution
rows stays inside whole-stage codegen — no Python in the hot path.
(The driver-side term-faithful twins used during per-document rule
evaluation live in rdf_n3_spark/functions/builtins.py.)

Calling convention
------------------
``SQL_REGISTRY[iri] = (mode, fn)`` where ``fn`` takes *raw term
Columns* (the engine's string term encoding — either a bare lexical
form like ``"12"`` / ``part_4`` or an N3-quoted literal like
``'"12"^^<...integer>'``; the codec below accepts both) and returns

    mode "compute"       fn(subj)          -> value Column (bind/compare)
    mode "compute_pair"  fn(a, b)          -> value Column (2-list ops)
    mode "compute_list"  fn(arr)           -> value Column (whole-list ops)
    mode "test"          fn(subj, obj)     -> Boolean Column (filter)
    mode "enum"          fn(subj)          -> Array Column (posexplode bind)

Computed values are *native* Spark types (long/double/string); the
caller casts to string when the value lands in a triple ``o`` slot.
:func:`apply_builtins` is the ResourceOperator execution skeleton as a
plan transform: bind when the object is an unbound variable, filter
when it is ground — scheduled greedily by unbound-input count exactly
like the reference's rank loop (formula.rb:163-185, builtin.rb:15-19).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rdf_n3_spark.functions.builtins import LIST, LOG, MATH, STR, TIME

# ------------------------------------------------------------- term codec

_QUOTED = r'^"'
_LEX_RE = r'^"((?:[^"\\]|\\.)*)"'


def lex(c: Column) -> Column:
    """Lexical form of a term column: strips N3 literal quoting if
    present, otherwise the raw string (bare-lexical encoding).
    Accepts non-string inputs (e.g. a value bound by an earlier
    builtin in the same chain) by casting first."""
    c = c.cast("string")
    return F.when(c.rlike(_QUOTED), F.regexp_extract(c, _LEX_RE, 1)).otherwise(c)


def as_num(c: Column) -> Column:
    """Permissive numeric coercion (extensions.rb:90-99): non-numeric
    lexicals → 0.0, mirroring the reference's `else 0`. try_cast, not
    cast — under ANSI mode a plain cast of one malformed lexical would
    raise CAST_INVALID_INPUT and kill the whole job."""
    return F.coalesce(lex(c).try_cast("double"), F.lit(0.0))


def as_str(c: Column) -> Column:
    return lex(c)


# ------------------------------------------------------------- registry

SQL_REGISTRY: dict[str, tuple] = {}


def _reg(iri: str, mode: str, fn, raw_args: tuple = ()) -> None:
    """``raw_args``: positions whose operand must be a ground constant
    passed to ``fn`` as a raw Python string — used for regex patterns,
    which Spark requires to be foldable for codegen (RegExpExtract)."""
    SQL_REGISTRY[iri] = (mode, fn, raw_args)


def _n(f):  # numeric wrapper: decode args, apply
    return lambda *cols: f(*[as_num(c) for c in cols])


def _s(f):  # string wrapper
    return lambda *cols: f(*[as_str(c) for c in cols])


# --- math (SURVEY §2.8 table 1; math/sum.rb etc.)
_reg(MATH + "sum", "compute_list",
     lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + as_num(x)))
_reg(MATH + "product", "compute_list",
     lambda arr: F.aggregate(arr, F.lit(1.0), lambda a, x: a * as_num(x)))
def _finite(col: Column) -> Column:
    """NaN/±Inf → null: a result outside the reals is 'no solution'
    in the driver registry (math.* raises there), so the distributed
    twin must not bind NaN garbage into downstream triples."""
    return F.when(
        ~F.isnan(col) & (col < float("inf")) & (col > float("-inf")), col
    )


_reg(MATH + "difference", "compute_pair", _n(lambda a, b: a - b))
# x/0 → null (driver: ZeroDivisionError filters the solution)
_reg(MATH + "quotient", "compute_pair", _n(lambda a, b: _finite(a / b)))
_INT_RX = r"^[+-]?[0-9]+$"


def _int_pair(ra, rb):
    """Trimmed lexicals (the driver's as_number strips before
    classifying, builtins.py:49), integer-lexical gate, and exact long
    casts (zero divisor → null = no solution)."""
    la, lb = F.trim(lex(ra)), F.trim(lex(rb))
    int_lex = la.rlike(_INT_RX) & lb.rlike(_INT_RX)
    al = la.try_cast("long")  # try_cast: magnitude beyond int64 → null, not an ANSI error
    bl = F.nullif(lb.try_cast("long"), F.lit(0))
    return int_lex, al, bl


def _floor_mod(al, bl):
    """Exact long floor-mod (sign of the divisor), Python/Ruby ``%``.
    NOT ``F.pmod`` — Spark's pmod is the always-non-negative modulus,
    which disagrees with floor-mod whenever the divisor is negative
    (pmod(1,-2)=1, floor-mod=-1).  Built from the truncated ``%`` plus
    a conditional divisor add; the add cannot overflow because the
    operands have opposite signs."""
    r = al % bl
    return F.when((r != 0) & ((r < 0) != (bl < 0)), r + bl).otherwise(r)


def _remainder_col(ra, rb):
    """Ruby ``%`` floor-mod over VALIDATED integer operands
    (math/remainder.rb:17-31): non-integer operands or a zero divisor
    yield null (no solution) instead of truncating or raising the ANSI
    REMAINDER_BY_ZERO error mid-job.

    Takes RAW term columns (not ``_n``-coerced): the reference
    validates the *type* of the operand, so a whole-VALUED decimal
    lexical like "4.0" must be rejected exactly as the driver registry
    rejects it (as_number('4.0') is Decimal, not Integer) — gating on
    value-integrality would accept it and diverge between layers.
    :func:`_floor_mod` stays in exact long arithmetic, matching the
    driver's Python ``%`` bit-for-bit across the whole int64 range —
    the former ``a - b*floor(double(a)/double(b))`` drifted beyond
    2^53."""
    int_lex, al, bl = _int_pair(ra, rb)
    return F.when(int_lex, _floor_mod(al, bl))


_reg(MATH + "remainder", "compute_pair", _remainder_col)
# 0 ** negative / overflow → null (no solution; Java pow gives Inf)
_reg(MATH + "exponentiation", "compute_pair",
     _n(lambda a, b: _finite(F.when(~((a == 0) & (b < 0)), F.pow(a, b)))))


def _integer_quotient_col(ra, rb):
    """Floor division matching the driver's exact int ``//``
    (builtins.py:195-197) across the int64 range: q = (a − fmod(a,b))/b
    with the subtraction AND division in decimal(38,0) — the long
    subtraction overflows for large mixed-sign pairs (a−r = b·q can
    reach 2^64), doubles round beyond 2^53, and a−r is an exact
    multiple of b so the decimal quotient is an integer representable
    exactly at scale 6.  Non-integer operands (Decimal/float pairs,
    where the driver itself uses floor-of-true-division) and int64
    overflows take the double path; the one quotient that cannot fit
    a long at all (MIN // −1 = 2^63) is excluded from the exact path
    so the final cast cannot raise under ANSI."""
    int_lex, al, bl = _int_pair(ra, rb)
    safe = (int_lex & al.isNotNull() & bl.isNotNull()
            & ~((al == F.lit(-(2 ** 63))) & (bl == F.lit(-1))))
    dec = lambda c: c.cast("decimal(38,0)")
    q = ((dec(al) - dec(_floor_mod(al, bl))) / dec(bl)).cast("long")
    a, b = as_num(ra), F.nullif(as_num(rb), F.lit(0.0))
    # a double-path quotient beyond int64 (e.g. MIN // −1 = 2^63) is
    # null (no solution): try_cast would SATURATE to ±MAX — a silently
    # wrong binding — and a plain ANSI cast would kill the job
    dbl = F.floor(a / b)
    lim = F.lit(float(2 ** 63))
    in_range = (dbl > -lim) & (dbl < lim)
    return F.when(safe, q).otherwise(F.when(in_range, dbl.cast("long")))


# nullif keeps a zero divisor from raising mid-job (null = no solution)
_reg(MATH + "integerQuotient", "compute_pair", _integer_quotient_col)
_reg(MATH + "negation", "compute", _n(lambda a: -a))
_reg(MATH + "absoluteValue", "compute", _n(F.abs))
# half-away-from-zero like Ruby Float#round (math/rounded.rb):
# -2.5 → -3, 2.5 → 3 (floor(x+0.5) would give -2 for -2.5)
_reg(MATH + "rounded", "compute",
     _n(lambda a: (F.signum(a) * F.floor(F.abs(a) + 0.5)).cast("long")))
_reg(MATH + "ceiling", "compute", _n(F.ceil))
_reg(MATH + "floor", "compute", _n(F.floor))
# finite-guarded: out-of-domain (asin 2, acosh 0.5, atanh ±1) and
# overflow (sinh 1000) yield null, matching the driver's raised-and-
# filtered semantics instead of binding NaN/Inf
for _name in ("sin", "cos", "tan", "sinh", "cosh", "tanh",
              "asin", "acos", "atan", "asinh", "acosh", "atanh"):
    _reg(MATH + _name, "compute",
         _n(lambda a, _f=getattr(F, _name): _finite(_f(a))))
_reg(MATH + "equalTo", "test", _n(lambda a, b: a == b))
_reg(MATH + "notEqualTo", "test", _n(lambda a, b: a != b))
_reg(MATH + "greaterThan", "test", _n(lambda a, b: a > b))
_reg(MATH + "lessThan", "test", _n(lambda a, b: a < b))
_reg(MATH + "notGreaterThan", "test", _n(lambda a, b: a <= b))
_reg(MATH + "notLessThan", "test", _n(lambda a, b: a >= b))
_reg(MATH + "memberCount", "compute_list", F.size)

# --- string (SURVEY §2.8 table 2; str/*.rb)
_reg(STR + "concatenation", "compute_list",
     lambda arr: F.array_join(F.transform(arr, as_str), ""))
_reg(STR + "contains", "test", _s(lambda a, b: a.contains(b)))
_reg(STR + "containsIgnoringCase", "test",
     _s(lambda a, b: F.lower(a).contains(F.lower(b))))
_reg(STR + "startsWith", "test", _s(F.startswith))
_reg(STR + "endsWith", "test", _s(F.endswith))
_reg(STR + "equalIgnoringCase", "test", _s(lambda a, b: F.lower(a) == F.lower(b)))
_reg(STR + "notEqualIgnoringCase", "test", _s(lambda a, b: F.lower(a) != F.lower(b)))
# Unicode code-order comparison: Spark string comparison is binary
# (UTF8_BINARY collation) = code-point order, matching str/greater_than.rb
_reg(STR + "greaterThan", "test", _s(lambda a, b: a > b))
_reg(STR + "lessThan", "test", _s(lambda a, b: a < b))
_reg(STR + "notGreaterThan", "test", _s(lambda a, b: a <= b))
_reg(STR + "notLessThan", "test", _s(lambda a, b: a >= b))
_reg(STR + "matches", "test",
     lambda a, pat: as_str(a).rlike(pat), raw_args=(1,))
_reg(STR + "notMatches", "test",
     lambda a, pat: ~as_str(a).rlike(pat), raw_args=(1,))
_reg(STR + "replace", "compute_list",
     lambda arr: F.replace(as_str(F.element_at(arr, 1)),
                           as_str(F.element_at(arr, 2)),
                           as_str(F.element_at(arr, 3))))
_reg(STR + "scrape", "compute_pair",
     lambda a, pat: F.regexp_extract(as_str(a), pat, 1), raw_args=(1,))


def _ws_norm(c):
    """cwm containsRoughly normalization: collapse whitespace runs,
    strip, lowercase."""
    return F.lower(F.trim(F.regexp_replace(as_str(c), r"\s+", " ")))


# cwm semantics (examples/string/roughly-out.n3); the reference raises
# NotImplemented (algebra.rb:178) — implemented here instead
_reg(STR + "containsRoughly", "test", lambda a, b: _ws_norm(a).contains(_ws_norm(b)))

#: percent-encoding safe sets pinned by examples/string/uriEncode-out.n3
_URI_SAFE_RE = r"^[A-Za-z0-9_.~#!$&'()*+,;=:?@-]$"
_FRAG_SAFE_RE = r"^[A-Za-z0-9_.!$&*+,;=:@/-]$"


def _pct_encode_col(c, safe_re: str):
    """Per-char percent encoder: safe chars pass, others become
    uppercase %XX per utf-8 byte — pure Column expr (split to chars →
    transform → join); niche op, never the scan hot path."""
    chars = F.split(as_str(c), "")
    enc = F.transform(
        chars,
        lambda ch: F.when(ch.rlike(safe_re), ch).otherwise(
            F.regexp_replace(F.upper(F.hex(F.encode(ch, "utf-8"))), "(..)", r"%$1")
        ),
    )
    return F.array_join(enc, "")


_reg(STR + "encodeForURI", "compute", lambda c: _pct_encode_col(c, _URI_SAFE_RE))
_reg(STR + "encodeForFragID", "compute", lambda c: _pct_encode_col(c, _FRAG_SAFE_RE))


_FORMAT_UDF = None


def _format_column(arr: Column) -> Column:
    """string:format (str/format.rb:12-15): Python %-interpolation of
    elements 1.. into element 0.  The % mini-language has no Column
    equivalent, so this is the one string op that runs as an
    Arrow-batched pandas UDF — decode happens JVM-side first, the UDF
    does only the interpolation.  Built lazily: pandas_udf needs an
    active session to parse its return-type DDL."""
    global _FORMAT_UDF
    if _FORMAT_UDF is None:

        @pandas_udf("string")
        def _fmt(args: pd.Series) -> pd.Series:
            def run(xs):
                if xs is None or len(xs) == 0 or xs[0] is None:
                    return None
                try:
                    return xs[0] % tuple(xs[1:])
                except (TypeError, ValueError):
                    return None

            return args.map(run)

        _FORMAT_UDF = _fmt
    return _FORMAT_UDF(F.transform(arr, as_str))


_reg(STR + "format", "compute_list", _format_column)

# --- time (SURVEY §2.8 table 3) — validity is a REGEX ON THE LEXICAL
# FORM (time/hour.rb:29-32 etc.), so components extract from the string,
# never from a parsed timestamp.

#: a lexical is a valid dateTime form only as a WHOLE (driver _DT_RE
#: anchors both ends; '2024-3-7' must not yield year=2024)
_DT_VALID = (r"^\d{4,}(-\d{2}(-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?)?)?"
             r"(Z|[+-]\d{2}:\d{2})?$")


def _time_component(group: int, need: str):
    full = (r"^(\d{4,})(?:-(\d{2}))?(?:-(\d{2}))?"
            r"(?:T(\d{2}):(\d{2})(?::(\d{2}))?)?")

    def run(c: Column) -> Column:
        lx = lex(c)
        return F.when(lx.rlike(need) & lx.rlike(_DT_VALID),
                      F.nullif(F.regexp_extract(lx, full, group), F.lit("")).cast("int"))

    return run


def _ts_padded(lx: Column) -> Column:
    """Lexical → timestamp with the reference's as_datetime padding
    (extensions.rb:105-113: '2024' ≡ 2024-01-01T00:00:00, etc.).
    try_to_timestamp throughout — a malformed lexical in one row must
    yield null (no solution), never the ANSI CAST_INVALID_INPUT error
    that would kill a 100 TB job; the _DT_VALID gate also rejects the
    lenient single-digit forms Spark's cast accepts but the lexical
    grammar does not."""
    return F.when(
        lx.rlike(_DT_VALID),
        F.coalesce(
            F.try_to_timestamp(lx),
            F.try_to_timestamp(lx, F.lit("yyyy-MM-dd'T'HH:mm")),
            F.try_to_timestamp(lx, F.lit("yyyy-MM")),
            F.try_to_timestamp(lx, F.lit("yyyy")),
        ),
    )


_reg(TIME + "year", "compute", _time_component(1, r"^\d{4}"))
_reg(TIME + "month", "compute", _time_component(2, r"^\d{4,}-\d{2}"))
_reg(TIME + "day", "compute", _time_component(3, r"^\d{4,}-\d{2}-\d{2}"))
_reg(TIME + "hour", "compute", _time_component(4, r"^\d{4,}-\d{2}-\d{2}T\d{2}"))
_reg(TIME + "minute", "compute", _time_component(5, r"^\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}"))
_reg(TIME + "second", "compute",
     _time_component(6, r"^\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"))
# 0 = Sunday (time/day_of_week.rb:15-25); F.dayofweek is 1 = Sunday.
# The weekday is of the LEXICAL's date fields (Ruby DateTime#wday keeps
# the offset), so strip any zone before parsing — converting an offset
# timestamp to the session TZ would shift small-hours dates.
_reg(TIME + "dayOfWeek", "compute",
     lambda c: F.dayofweek(_ts_padded(
         F.regexp_replace(lex(c), r"(Z|[+-]\d{2}:\d{2})$", ""))) - 1)
# trailing numeric offset; absent or "Z" → invalid (time/timezone.rb:17-33)
_reg(TIME + "timeZone", "compute",
     lambda c: F.nullif(F.regexp_extract(lex(c), r"([+-]\d{2}:\d{2})$", 1), F.lit("")))
# session TZ is pinned UTC (session.py), so zoneless lexicals parse as
# UTC; partial forms pad like the driver (as_datetime coercion)
_reg(TIME + "inSeconds", "compute",
     lambda c: F.unix_timestamp(_ts_padded(lex(c))))

#: strftime directive → Spark datetime-pattern fragment (the subset the
#: reference's fixtures use; gm_time.rb formats via Ruby strftime)
_STRFTIME_JAVA = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "I": "hh", "M": "mm", "S": "ss", "j": "DDD",
    "F": "yyyy-MM-dd", "T": "HH:mm:ss", "z": "xx", ":z": "xxx",
    "p": "a", "A": "EEEE", "a": "EEE", "B": "MMMM", "b": "MMM",
}


def _strftime_to_java(fmt: str) -> str:
    """strftime format string → Spark/Java datetime pattern; literal
    letters are quoted so date_format doesn't interpret them."""
    if fmt == "":
        fmt = "%FT%T%:z"
    out, i = [], 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            key = fmt[i + 1:i + 3] if fmt[i + 1] == ":" else fmt[i + 1]
            if key == "%":
                out.append("%")
            elif key in _STRFTIME_JAVA:
                out.append(_STRFTIME_JAVA[key])
            else:
                raise ValueError(f"unsupported strftime directive %{key}")
            i += 1 + len(key)
        else:
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


# current processing time formatted per the (constant) subject format —
# F.current_timestamp() is fixed per query, so one job gets one time.
# Session TZ is pinned UTC, so gmTime ≡ localTime here (documented);
# date_format needs a foldable pattern → subject must be ground.
_reg(TIME + "gmTime", "compute",
     lambda fmt: F.date_format(F.current_timestamp(), _strftime_to_java(fmt)),
     raw_args=(0,))
_reg(TIME + "localTime", "compute",
     lambda fmt: F.date_format(F.current_timestamp(), _strftime_to_java(fmt)),
     raw_args=(0,))

# --- list (SURVEY §2.8 table 4; list/*.rb)
# try_element_at: an EMPTY list yields null (no solution, matching the
# driver) — ANSI element_at would raise INVALID_ARRAY_INDEX and kill
# the whole job on one empty-list row
_reg(LIST + "first", "compute_list", lambda arr: F.try_element_at(arr, F.lit(1)))
_reg(LIST + "last", "compute_list", lambda arr: F.try_element_at(arr, F.lit(-1)))
_reg(LIST + "length", "compute_list", F.size)
_reg(LIST + "append", "compute_list", F.flatten)
_reg(LIST + "member", "enum", lambda arr: arr)
_reg(LIST + "in", "test", lambda x, arr: F.array_contains(arr, x))
_reg(LIST + "iterate", "enum", lambda arr: arr)  # posexplode → (index, value)

# --- log equality: same-TERM identity, not value equality
# (log/equal_to.rb:30-32) — raw encoded-term comparison, no decode
_reg(LOG + "equalTo", "test", lambda a, b: a.eqNullSafe(b))
_reg(LOG + "notEqualTo", "test", lambda a, b: ~a.eqNullSafe(b))
# (string dtype-IRI) → typed literal / (string lang) → lang-tagged
# literal, as term-encoding construction (log/dtlit.rb, log/langlit.rb)
_reg(LOG + "dtlit", "compute_pair",
     lambda a, b: F.concat(F.lit('"'), as_str(a), F.lit('"^^<'),
                           F.regexp_replace(as_str(b), r"^<|>$", ""), F.lit(">")))
_reg(LOG + "langlit", "compute_pair",
     lambda a, b: F.concat(F.lit('"'), as_str(a), F.lit('"@'), as_str(b)))


# ------------------------------------------------ backward (inverse) mode
# ResourceOperator resource_operator.rb:45-47: when the SUBJECT is the
# unbound variable and the object is ground, invertible operators bind
# the subject with the inverse computation.

SQL_INVERSES: dict[str, object] = {
    MATH + "negation": _n(lambda o: -o),            # self-inverse
    # math/sin.rb object-var branch family — both directions,
    # finite-guarded like the forward registrations
    MATH + "sin": _n(lambda o: _finite(F.asin(o))),
    MATH + "cos": _n(lambda o: _finite(F.acos(o))),
    MATH + "tan": _n(lambda o: _finite(F.atan(o))),
    MATH + "sinh": _n(lambda o: _finite(F.asinh(o))),
    MATH + "cosh": _n(lambda o: _finite(F.acosh(o))),
    MATH + "tanh": _n(lambda o: _finite(F.atanh(o))),
    MATH + "asin": _n(lambda o: _finite(F.sin(o))),
    MATH + "acos": _n(lambda o: _finite(F.cos(o))),
    MATH + "atan": _n(lambda o: _finite(F.tan(o))),
    MATH + "asinh": _n(lambda o: _finite(F.sinh(o))),
    MATH + "acosh": _n(lambda o: _finite(F.cosh(o))),
    MATH + "atanh": _n(lambda o: _finite(F.tanh(o))),
    # epoch seconds → dateTime lexical (time/in_seconds.rb:17-41 object branch)
    TIME + "inSeconds": lambda o: F.date_format(
        F.to_timestamp(as_num(o).try_cast("long")), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    ),
}


# ------------------------------------------------------- execution skeleton

def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _resolve(sol: DataFrame, t):
    """Term → Column: variable → its solution column (type preserved —
    an array-bound variable stays an array, so list ops compose),
    constant → string lit, tuple/list of terms → array of resolved
    terms (Spark unifies the element type)."""
    if isinstance(t, (tuple, list)):
        return F.array(*[_resolve(sol, x) for x in t])
    return F.col(t[1:]) if _is_var(t) else F.lit(str(t))


def _inputs_ready(sol: DataFrame, t) -> bool:
    if isinstance(t, (tuple, list)):
        return all(_inputs_ready(sol, x) for x in t)
    return (not _is_var(t)) or t[1:] in sol.columns


def apply_builtins(sol: DataFrame, specs) -> DataFrame:
    """Run builtin specs ``(subject, iri, object)`` over a solution
    DataFrame — the ResourceOperator/ListOperator skeleton
    (resource_operator.rb:19-71) as plan construction.

    * object is an unbound ``?var`` → ``withColumn`` bind ("compute" modes)
      or ``posexplode`` bind ("enum");
    * object ground / already bound → compare-and-filter;
    * "test" mode → boolean filter.

    Scheduling is the reference's rank loop (formula.rb:163-185): each
    pass runs every spec whose inputs are bound; specs waiting on a
    variable another builtin will bind run in a later pass.  Purely
    driver-side plan construction — the data never round-trips.
    """
    pending = list(specs)
    while pending:
        progressed = False
        rest = []
        for spec in pending:
            subj, iri, obj = spec
            mode, fn, raw_args = SQL_REGISTRY[iri]

            def res(term, pos):
                """Operand → Column, or raw Python string for foldable-
                pattern positions (must be ground there)."""
                if pos in raw_args:
                    if _is_var(term):
                        raise ValueError(f"{iri}: operand {pos} must be a constant pattern")
                    return str(term)
                return _resolve(sol, term)

            if not _inputs_ready(sol, subj):
                # backward mode: unbound subject var + ground object +
                # registered inverse → bind the subject
                if (
                    mode == "compute"
                    and _is_var(subj)
                    and iri in SQL_INVERSES
                    and _inputs_ready(sol, obj)
                ):
                    sol = sol.withColumn(subj[1:], SQL_INVERSES[iri](_resolve(sol, obj)))
                    progressed = True
                    continue
                rest.append(spec)
                continue
            if mode == "test":
                if not _inputs_ready(sol, obj):
                    rest.append(spec)
                    continue
                sol = sol.where(fn(res(subj, 0), res(obj, 1)))
            elif mode == "enum":
                arr = fn(_resolve(sol, subj))
                if _is_var(obj) and obj[1:] not in sol.columns:
                    if iri == LIST + "iterate":
                        # (index value) pair per element (list/iterate.rb)
                        sol = sol.select(
                            "*", F.posexplode(arr).alias(f"{obj[1:]}_idx", obj[1:])
                        )
                    else:
                        sol = sol.select("*", F.explode(arr).alias(obj[1:]))
                else:
                    sol = sol.where(F.array_contains(arr, _resolve(sol, obj).cast("string")))
            else:  # compute / compute_pair / compute_list
                val = (fn(*[res(x, i) for i, x in enumerate(subj)])
                       if mode == "compute_pair"
                       else fn(res(subj, 0)))
                if _is_var(obj) and obj[1:] not in sol.columns:
                    sol = sol.withColumn(obj[1:], val)
                else:
                    # compare-and-filter (resource_operator.rb:63-69):
                    # numeric computes compare as numbers (so "-2" matches
                    # -2.0), everything else on the lexical form
                    probe = sol.withColumn("__v", val)
                    numeric = probe.schema["__v"].dataType.typeName() in (
                        "double", "float", "long", "integer", "short", "decimal"
                    )
                    o = _resolve(sol, obj)
                    cond = (F.col("__v") == as_num(o)) if numeric else (
                        F.col("__v").cast("string") == as_str(o)
                    )
                    sol = probe.where(cond).drop("__v")
            progressed = True
        if rest and not progressed:
            unbound = [s[1] for s in rest]
            raise ValueError(f"builtin inputs never bound: {unbound}")
        pending = rest
    return sol
