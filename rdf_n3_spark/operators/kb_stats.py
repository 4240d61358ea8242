"""KB profile statistics: characteristic sets and VoID-style
per-predicate partitions.

Characteristic sets (Neumann & Moerkotte, "Characteristic Sets:
Accurate Cardinality Estimation for RDF Queries with Multiple Joins",
ICDE 2011) are THE cardinality statistic for star-shaped BGP joins —
the exact join shape this engine's `plans/bgp.py` multiway join runs
over `?s p1 ?o1 . ?s p2 ?o2 ...` patterns (reference
lib/rdf/n3/algebra/formula.rb:125-147 evaluates the same stars
in-process, where no statistics are needed; at cluster scale the
optimizer wants them).  A subject's characteristic set is its distinct
predicate set; the profile says exactly how many subjects will survive
any star of predicates — an EXACT cardinality for distinct-subject
star queries, not an estimate.

VoID (the W3C "Vocabulary of Interlinked Datasets" property-partition
profile) is the standard dataset descriptor RDF stores publish:
per-predicate triple counts and distinct subject/object counts.

Scale shape: both are two-exchange profiles.  `characteristic_sets`
groups by subject (collect_set over the FEW distinct predicates a
subject carries — bounded by schema width, not data; partial-merged
map-side) then by the set itself; `void_stats` is one predicate-keyed
agg whose count-distincts Spark expands and partial-aggregates.  For
web-scale distinct counts where exactness isn't required, the
mergeable `sketch.kmv_distinct` is the drop-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _esc(p):
    """Delimiter-safe predicate encoding for the cs string: '%'→'%25'
    then '|'→'%7C', so a predicate CONTAINING '|' (mined relation
    surfaces come from raw prose) can never collide {'a|b'} with
    {'a','b'} — without escaping, those two distinct characteristic
    sets would merge and star_cardinality's split would see phantom
    predicates."""
    return F.regexp_replace(F.regexp_replace(p, "%", "%25"), r"\|", "%7C")


def _esc_py(p: str) -> str:
    """Driver-side twin of :func:`_esc` for probe predicates."""
    return p.replace("%", "%25").replace("|", "%7C")


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """(cs, n_subjects, n_triples) — one row per distinct
    characteristic set: the '|'-joined sorted predicate set
    (predicates delimiter-escaped via :func:`_esc`), how many subjects
    carry exactly that set, and their total triple count.

    Cardinality use: a star query over predicates P matches exactly
    sum(n_subjects) over the sets cs ⊇ P (distinct-subject
    semantics) — the ICDE'11 estimator, exact by construction."""
    per_subj = triples.groupBy("s").agg(
        F.concat_ws("|", F.array_sort(F.collect_set(_esc(F.col("p")))))
        .alias("cs"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    return per_subj.groupBy("cs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.sum("nt").cast("bigint").alias("n_triples"),
    )


def void_stats(triples: DataFrame) -> DataFrame:
    """(p, n_triples, n_subjects, n_objects) — the VoID property
    partition: per predicate, total triples and exact distinct
    subject/object counts."""
    return triples.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
        F.countDistinct("s").cast("bigint").alias("n_subjects"),
        F.countDistinct("o").cast("bigint").alias("n_objects"),
    )


def load_predicate_counts(void_df: DataFrame) -> dict:
    """Collect a VoID profile (``void_stats`` output, or the parquet
    the batch job's ``--profile`` stage wrote) into the
    {predicate: n_triples} dict that
    :func:`rdf_n3_spark.plans.bgp.order_patterns` consumes.  The one
    ``.collect()`` that is genuinely driver-sized: rows ∝ distinct
    predicates (schema width), never data."""
    return {r["p"]: r["n_triples"]
            for r in void_df.select("p", "n_triples").collect()}


def star_cardinality(triples: DataFrame, predicates: list[str]) -> DataFrame:
    """(n_subjects) — EXACT number of distinct subjects matching the
    star `?s p1 ?o1 . ?s p2 ?o2 ...` over ``predicates``, answered
    from the characteristic-set profile alone (sets are superset-
    matched with array_contains over the tiny profile table — the
    profile has one row per distinct schema shape, not per subject)."""
    cs = characteristic_sets(triples).withColumn(
        "ps", F.split(F.col("cs"), r"\|"))
    cond = F.lit(True)
    for p in predicates:
        cond = cond & F.array_contains("ps", _esc_py(p))
    return cs.where(cond).agg(
        F.coalesce(F.sum("n_subjects"), F.lit(0)).cast("bigint")
        .alias("n_subjects"))
