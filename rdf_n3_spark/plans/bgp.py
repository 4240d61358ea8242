"""Distributed BGP (basic graph pattern) matching and rule fixpoint as
DataFrame join-project pipelines.

This is the Spark-first re-expression of the reference's query core:

* one triple pattern against the store — constants become filter
  predicates, variables become projected columns
  (reference lib/rdf/n3/repository.rb:187-242 ``query_pattern``);
* a conjunction of patterns — cascade of equi-joins on shared
  variable names, Catalyst picks broadcast vs sort-merge and AQE
  splits skewed hub-entity keys
  (reference lib/rdf/n3/algebra/formula.rb:125-147 BGP multiway join,
  RDF::Query solution ``merge`` = natural join);
* rule application (``log:implies``) — antecedent solutions projected
  through the consequent templates, results flagged ``inferred``
  (reference lib/rdf/n3/algebra/log/implies.rb:28-96);
* fixpoint closure (``Reasoner#execute`` think-loop,
  reference lib/rdf/n3/reasoner.rb:122-140) — but **semi-naive**
  instead of the reference's naive re-derive-everything rounds: each
  round joins only the delta against the full store (one delta-seat
  per antecedent pattern), so round cost tracks NEW derivations, not
  total store size. ``localCheckpoint`` per round keeps the plan flat
  at any number of iterations.

Terms are the engine's string encoding (IRIs/skolem ids/literals);
variables are ``?name`` strings inside patterns only — at execution
a variable is just a join/projection column name (SURVEY §1.1).

Driver-side work here is *plan construction only* (tiny, rule-count
bound); all data movement is DataFrame joins.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("s", "p", "o")


def _is_var(t: str) -> bool:
    return isinstance(t, str) and t.startswith("?")


@dataclass(frozen=True)
class Rule:
    """antecedent patterns => consequent templates (both triple lists).

    ``builtins`` — optional ``(subject, iri, object)`` builtin specs
    evaluated over the antecedent solutions as Column expressions
    (rdf_n3_spark.functions.sql_builtins), the distributed equivalent
    of the reference's in-rule builtin operators (formula.rb:163-185).
    """

    antecedent: tuple
    consequent: tuple
    builtins: tuple = ()


def match_pattern(triples: DataFrame, pat, keep_graph: bool = False) -> DataFrame:
    """One triple pattern → solution DataFrame (one column per variable).

    Constants filter (pushed to the scan by Catalyst — a parquet-backed
    store prunes row groups on ``p``/``s``); repeated variables within
    the pattern add same-row equality predicates. ``keep_graph``
    carries the ``g`` column through — solutions then only merge within
    one graph (formula-scoped matching, formula.rb:33-36).
    """
    df = triples
    first_col: dict[str, str] = {}
    for col, t in zip(_POS, pat):
        if _is_var(t):
            if t in first_col:
                df = df.where(F.col(col) == F.col(first_col[t]))
            else:
                first_col[t] = col
        else:
            df = df.where(F.col(col) == F.lit(t))
    cols = [F.col(c).alias(v[1:]) for v, c in first_col.items()]
    if keep_graph:
        cols.append(F.col("g"))
    return df.select(*cols)


def order_patterns(patterns, predicate_counts: dict | None = None,
                   star_cards: list | None = None) -> list:
    """Greedy selectivity + connectivity join order for the BGP fold —
    returns a permutation of pattern indices.

    Two rules, in priority order:

    1. CONNECTIVITY: once anything is bound, only patterns sharing a
       variable with the bound set are eligible (a disjoint pattern
       would be a cross join — the shape that explodes at 100 TB; it
       is deferred until nothing else connects, i.e. until the product
       is semantically unavoidable).
    2. SELECTIVITY: among eligible patterns, fewest variable positions
       first (a ground or 1-var pattern filters hardest at the scan —
       Catalyst pushes the constant equality into the parquet reader),
       tie-broken by statistics when supplied, then by input position
       so the order is deterministic.

    Statistics, most-refined first:

    * ``star_cards`` — a collected characteristic-set profile
      (`kb_stats.load_char_sets`): when the candidate extends a star
      already under construction (its subject variable has ground-
      predicate seats among the chosen patterns), the estimate is the
      EXACT distinct-subject cardinality of the joint star
      (ICDE'11 superset sum) — two individually-frequent but
      jointly-rare predicates order correctly where per-predicate
      counts mislead.
    * ``predicate_counts`` — a collected VoID profile
      (`kb_stats.load_predicate_counts`): the predicate's triple
      count, used when no star context applies.

    Absent-from-profile = ZERO cardinality = the most selective seat
    possible (it empties the join instantly, so everything after it is
    skipped-by-emptiness).  This means a supplied profile must COVER
    the store — a stale profile missing live predicates misorders
    (never miscomputes).  `kb_stats.load_profile` ENFORCES that
    contract: it returns (None, None) unless the profile's coverage
    fingerprint matches the store's committed batches — load profiles
    through it rather than handing this function a partial dict.

    Inner equi-joins commute and the fold ends in dropDuplicates, so
    any order returns the same solution set (pinned by
    tests/test_bgp_order.py); Spark's own CBO join reordering is off
    by default and never sees these semantics, so the engine orders
    the fold itself — the reference evaluates patterns in author order
    (formula.rb:125-147), fine in-process, quadratic-risk distributed.
    """
    def vars_of(i):
        return {t for t in patterns[i] if _is_var(t)}

    big = 1 << 62
    # subject var → ground predicates of already-chosen seats: the
    # star under construction that star_cards can price exactly
    subj_preds: dict[str, set] = {}

    def key(i):
        pat = patterns[i]
        nv = len([t for t in pat if _is_var(t)])
        s, p = pat[0], pat[1]
        if (star_cards is not None and _is_var(s) and not _is_var(p)
                and subj_preds.get(s)):
            est = sum(n for cs, n in star_cards
                      if subj_preds[s] | {p} <= cs)
        elif predicate_counts is not None and not _is_var(p):
            est = predicate_counts.get(p, 0)
        else:
            est = big
        return (nv, est, i)

    remaining = set(range(len(patterns)))
    order: list[int] = []
    bound: set[str] = set()
    while remaining:
        pool = [i for i in remaining if vars_of(i) & bound] if bound else []
        nxt = min(pool or remaining, key=key)
        order.append(nxt)
        remaining.remove(nxt)
        bound |= vars_of(nxt)
        s, p = patterns[nxt][0], patterns[nxt][1]
        if _is_var(s) and not _is_var(p):
            subj_preds.setdefault(s, set()).add(p)
    return order


def bgp(triples: DataFrame, patterns, sources=None, keep_graph: bool = False,
        pattern_cache: dict | None = None,
        predicate_counts: dict | None = None,
        star_cards: list | None = None) -> DataFrame:
    """Conjunctive pattern join. ``sources`` optionally overrides the
    store per pattern seat (used by the semi-naive delta rounds).

    Shared variables → inner equi-join; disjoint patterns → cross join
    (RDF::Query::Solutions#merge semantics). Solutions deduped — the
    reference applies ``.compact.uniq`` after every operator
    (resource_operator.rb:70). Seats fold in :func:`order_patterns`
    order (connectivity-first greedy, optionally refined by a
    ``predicate_counts`` profile), never author order — cross joins
    only happen when the BGP is genuinely disconnected. With ``keep_graph`` the ``g`` column is
    a join key on every seat, so patterns only co-match inside one
    graph — ALL graphs evaluate in one distributed job instead of a
    per-formula loop.

    ``pattern_cache``: seat-sharing memo {(pattern, id(source),
    keep_graph) → matched DataFrame}. The semi-naive fixpoints build
    rules×patterns seats per round, and many rules share patterns over
    the same (total | delta) source — reusing the matched DataFrame
    object keeps driver-side plan construction (and the analyzed-plan
    cache) growing with *distinct* patterns, not rule count. Callers
    must pass the SAME source DataFrame object for seats meant to
    share (the memo keys on object identity, which is what makes two
    seats the same logical subplan).
    """
    sol = None
    for i in order_patterns(patterns, predicate_counts, star_cards):
        pat = patterns[i]
        src = sources[i] if sources is not None else triples
        if pattern_cache is not None:
            key = (pat, id(src), keep_graph)
            m = pattern_cache.get(key)
            if m is None:
                m = pattern_cache[key] = match_pattern(src, pat, keep_graph=keep_graph)
        else:
            m = match_pattern(src, pat, keep_graph=keep_graph)
        if sol is None:
            sol = m
        else:
            shared = [c for c in sol.columns if c in m.columns]
            sol = sol.join(m, on=shared, how="inner") if shared else sol.crossJoin(m)
    return sol.dropDuplicates()


def _instantiate(sol: DataFrame, templates) -> DataFrame:
    """Project solutions through consequent triple templates."""

    def term(t):
        return F.col(t[1:]) if _is_var(t) else F.lit(t)

    outs = [
        sol.select(
            term(s).cast("string").alias("s"),
            term(p).cast("string").alias("p"),
            term(o).cast("string").alias("o"),
        )
        for (s, p, o) in templates
    ]
    return reduce(lambda a, b: a.unionByName(b), outs).dropDuplicates()


def apply_rule(triples: DataFrame, rule: Rule) -> DataFrame:
    """One forward application: antecedent BGP → consequent triples.

    Inner joins enforce the reference's full-binding requirement
    (log/implies.rb:47-52: only solutions binding every antecedent
    universal fire the rule).
    """
    return _instantiate(_solutions(triples, rule), rule.consequent)


def _solutions(triples: DataFrame, rule: Rule, sources=None,
               pattern_cache: dict | None = None) -> DataFrame:
    sol = bgp(triples, rule.antecedent, sources=sources,
              pattern_cache=pattern_cache)
    if rule.builtins:
        from rdf_n3_spark.functions.sql_builtins import apply_builtins

        sol = apply_builtins(sol, rule.builtins)
    return sol


def _apply_rule_delta(total: DataFrame, delta: DataFrame, rule: Rule,
                      pattern_cache: dict | None = None) -> DataFrame:
    """Semi-naive round: every derivation must use ≥1 delta triple —
    union over antecedent seats of (delta at seat i, total elsewhere)."""
    pats = rule.antecedent
    outs = []
    for i in range(len(pats)):
        sources = [delta if j == i else total for j in range(len(pats))]
        outs.append(_instantiate(
            _solutions(total, rule, sources=sources,
                       pattern_cache=pattern_cache),
            rule.consequent))
    return reduce(lambda a, b: a.unionByName(b), outs).dropDuplicates()


def fixpoint(triples: DataFrame, rules, max_iter: int = 25) -> DataFrame:
    """Closure under ``rules``; returns (s, p, o, inferred).

    Semi-naive: round N only joins the round-(N-1) delta; terminates
    when a round derives nothing new (the reference terminates when the
    store count stops growing, reasoner.rb:123-140 — same condition,
    but checked on the delta so no full recount). ``localCheckpoint``
    per round truncates lineage; the anti-join dedup against the total
    store implements set-insert semantics (repository.rb:297-307).
    """
    base = triples.select(*_POS).dropDuplicates().localCheckpoint()
    total = base.withColumn("inferred", F.lit(False))
    delta = base
    for _ in range(max_iter):
        # one shared source object + per-round seat memo: identical
        # (pattern, source) seats across rules reuse one matched plan
        tot = total.select(*_POS)
        cache: dict = {}
        derived = reduce(
            lambda a, b: a.unionByName(b),
            [_apply_rule_delta(tot, delta, r, pattern_cache=cache)
             for r in rules],
        )
        new = (
            derived.join(total.select(*_POS), list(_POS), "left_anti")
            .dropDuplicates()
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        total = total.unionByName(new.withColumn("inferred", F.lit(True))).localCheckpoint()
        delta = new
    return total


def conclusions(closed: DataFrame) -> DataFrame:
    """Inferred-only projection (reasoner.rb:226-233)."""
    return closed.where(F.col("inferred")).select(*_POS)


# ---------------------------------------------------- per-graph closure

def _instantiate_g(sol: DataFrame, templates) -> DataFrame:
    """Project graph-scoped solutions through consequent templates,
    keeping each derivation inside its source graph."""

    def term(t):
        return F.col(t[1:]) if _is_var(t) else F.lit(t)

    outs = [
        sol.select(
            term(s).cast("string").alias("s"),
            term(p).cast("string").alias("p"),
            term(o).cast("string").alias("o"),
            F.col("g"),
        )
        for (s, p, o) in templates
    ]
    return reduce(lambda a, b: a.unionByName(b), outs).dropDuplicates()


def fixpoint_per_graph(quads: DataFrame, rules, max_iter: int = 25) -> DataFrame:
    """Semi-naive closure of EVERY graph simultaneously → (s,p,o,g,inferred).

    The reference's ``log:conclusion`` closes one formula at a time in
    process (log/conclusion.rb:18-32); here the graph id rides along as
    a join key, so one job closes millions of per-conversation graphs —
    the per-graph loop is replaced by data parallelism, and rounds run
    until the LAST graph converges (early-converged graphs contribute
    no delta rows and cost nothing).
    """
    cols = [*_POS, "g"]
    base = quads.select(*cols).dropDuplicates().localCheckpoint()
    total = base.withColumn("inferred", F.lit(False))
    delta = base
    for _ in range(max_iter):
        outs = []
        # hoisted once per round: seats share ONE source object so the
        # pattern memo below can key on identity — plan size grows with
        # distinct patterns, not rules × patterns (VERDICT r2 item 9)
        tot = total.select(*cols)
        cache: dict = {}
        for r in rules:
            pats = r.antecedent
            for i in range(len(pats)):
                sources = [delta if j == i else tot for j in range(len(pats))]
                sol = bgp(tot, pats, sources=sources, keep_graph=True,
                          pattern_cache=cache)
                if r.builtins:
                    # builtin constraints compose with the g column —
                    # same rank-scheduled Column transforms as the
                    # global fixpoint (_solutions), per-graph for free
                    from rdf_n3_spark.functions.sql_builtins import apply_builtins

                    sol = apply_builtins(sol, r.builtins)
                outs.append(_instantiate_g(sol, r.consequent))
        derived = reduce(lambda a, b: a.unionByName(b), outs)
        new = (
            derived.join(total.select(*cols), cols, "left_anti")
            .dropDuplicates()
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        total = total.unionByName(new.withColumn("inferred", F.lit(True))).localCheckpoint()
        delta = new
    return total
