"""Salted aggregation: two-phase groupBy for hub-key skew.

North-rule requirement: "salted aggregations" for hub entities (one
surface form owns ~20% of all mentions). A plain ``groupBy(key)``
ships every row of the hot key to one reducer; salting splits the hot
key across S sub-keys (`concat(key, '#', pmod(hash(row), S))`),
aggregates the sub-keys in parallel, then combines the S partials —
the hot key's reduce work drops by S×.

For algebraic aggregates Spark's map-side partial aggregation already
bounds hub-key traffic to one partial row per input partition, so
salting matters when (a) partial aggregation is disabled/inapplicable
(collect_list/percentile-style holistic aggregates), or (b) the
per-key state is large. The operator is provided for both cases and
as the explicit, auditable form of the skew contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_col(*cols: Column | str, salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic row salt in [0, salts) from arbitrary row columns
    (deterministic ⇒ retries and the DuckDB oracle agree)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cs), F.lit(salts))


def salted_count(df: DataFrame, key: str, row_cols: list[str],
                 salts: int = DEFAULT_SALTS) -> DataFrame:
    """count(*) per ``key`` via salt → partial count → combine.

    Phase 1 groups on (key, salt): the hot key becomes ``salts``
    evenly-sized groups. Phase 2 sums the ≤``salts`` partials per key —
    trivially small. Result identical to ``groupBy(key).count()``.
    """
    partial = (
        df.withColumn("__salt", salt_col(*row_cols, salts=salts))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))


def salted_collect_set(df: DataFrame, key: str, value: str, row_cols: list[str],
                       salts: int = DEFAULT_SALTS) -> DataFrame:
    """collect_set per key — a HOLISTIC aggregate with no map-side
    partial in the same way; the salted two-phase keeps any single
    task's state to the hot key's 1/S share, then merges the S sets."""
    partial = (
        df.withColumn("__salt", salt_col(*row_cols, salts=salts))
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__vs"))
    )
    return partial.groupBy(key).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("__vs")))).alias("values")
    )
