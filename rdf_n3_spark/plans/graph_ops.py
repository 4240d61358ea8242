"""Graph-level N3 operators as join shapes.

* :func:`graph_includes` / :func:`graph_not_includes` — the
  ``log:includes`` / ``log:notIncludes`` formula-subset test
  (reference lib/rdf/n3/algebra/log/includes.rb:40-68,
  log/not_includes.rb:23-25) lifted from one formula pair to *all
  graphs at once*: instead of querying one object-formula against one
  subject-formula, we match every pattern against the quad store and
  keep the graphs that satisfy every pattern (semi-join shape) or
  fail at least one (anti-join shape).  One groupBy per call, no
  driver iteration.

* :func:`output_strings` — ``log:outputString`` (log/output_string.rb:30-33,
  reasoner.rb:254-259): strings accumulated per key, emitted in key
  order.  Re-expressed as sort_array-over-collect_list so the result
  is deterministic without a global sort of the data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _graphs_matching(quads: DataFrame, pattern) -> DataFrame:
    """Graphs (g values) containing ≥1 match of one (s,p,o) pattern.

    Constants become pushed-down filters; a variable repeated within
    the pattern adds a same-row equality (repository.rb query_pattern
    semantics).  Shuffles only distinct graph ids, never triples.
    """
    df = quads
    seen: dict[str, str] = {}
    for col, t in zip(("s", "p", "o"), pattern):
        if isinstance(t, str) and t.startswith("?"):
            if t in seen:
                df = df.where(F.col(col) == F.col(seen[t]))
            else:
                seen[t] = col
        else:
            df = df.where(F.col(col) == F.lit(t))
    return df.select("g").dropDuplicates()


def _pattern_vars(pattern) -> set:
    return {t for t in pattern if isinstance(t, str) and t.startswith("?")}


def _var_components(patterns) -> list[list]:
    """Group patterns into connected components by shared variables
    (driver-side union-find over the pattern list — tiny)."""
    parent = list(range(len(patterns)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    by_var: dict[str, int] = {}
    for i, p in enumerate(patterns):
        for v in _pattern_vars(p):
            if v in by_var:
                parent[find(i)] = find(by_var[v])
            else:
                by_var[v] = i
    comps: dict[int, list] = {}
    for i, p in enumerate(patterns):
        comps.setdefault(find(i), []).append(p)
    return list(comps.values())


def graph_includes(quads: DataFrame, patterns) -> DataFrame:
    """Graph names whose triple set entails the pattern conjunction.

    The reference's log:includes runs the object formula as ONE BGP
    query against the subject formula (includes.rb:57-58), so variables
    shared between patterns must bind consistently *within a graph* —
    not just match pattern-by-pattern.  Plan shape: patterns are
    grouped into variable-connected components; a singleton component
    is a pushed-down filter + distinct-g projection (no solution
    shuffle), a multi-pattern component is a per-graph BGP join
    (bgp(..., keep_graph=True) — g rides every seat as a join key)
    projected to distinct g.  Components are independent by
    construction, so their graph sets intersect via a count
    aggregation over graph ids only.
    """
    comps = _var_components(list(patterns))
    per = []
    for i, comp in enumerate(comps):
        if len(comp) == 1:
            g = _graphs_matching(quads, comp[0])
        else:
            from rdf_n3_spark.plans.bgp import bgp

            g = bgp(quads, comp, keep_graph=True).select("g").dropDuplicates()
        per.append(g.withColumn("__pat", F.lit(i)))
    if len(per) == 1:
        return per[0].select("g")
    hits = reduce(lambda a, b: a.unionByName(b), per)
    return (
        hits.groupBy("g")
        .agg(F.countDistinct("__pat").alias("__n"))
        .where(F.col("__n") == len(comps))
        .select("g")
    )


def graph_not_includes(quads: DataFrame, patterns) -> DataFrame:
    """Graphs failing ≥1 pattern — ``log:notIncludes`` as an anti-join
    of all graphs against the includes set."""
    all_g = quads.select("g").dropDuplicates()
    return all_g.join(graph_includes(quads, patterns), "g", "left_anti")


def output_strings(df: DataFrame, key: str, value: str, order: str) -> DataFrame:
    """``log:outputString``: concatenate ``value`` strings per ``key``
    in ``order``, one output row per key, emitted sorted by key.

    collect_list + sort_array of (order, value) structs keeps the
    ordering local to each group (no global orderBy before the agg);
    the hub-key risk is bounded because output strings are per-subject
    in the reference (reasoner.rb:254-259) and per-conversation here.
    """
    pair = F.struct(F.col(order).alias("o"), F.col(value).alias("v"))
    return (
        df.groupBy(key)
        .agg(F.sort_array(F.collect_list(pair)).alias("__pairs"))
        .select(
            F.col(key),
            F.array_join(F.transform("__pairs", lambda p: p["v"]), "\n").alias("out"),
        )
        .orderBy(key)
    )
