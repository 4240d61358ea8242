"""Entity-link scoring: candidate (mention, entity) pairs → link scores.

North-star requirement: "batched mention detection and entity-link
scoring inside vectorized pandas/Arrow UDFs". Mention detection stays
Column-expression (JVM-side beats any UDF there); scoring is where a
real linker runs model-ish code per candidate pair, so it lives in an
Arrow-batched ``pandas_udf`` — one Python invocation per batch of
pairs, zero per-row overhead, swap the scoring body for an actual
model without touching the plan.

The sandbox scorer is a deterministic blend (char-3-gram Jaccard,
normalized edit distance, prefix agreement) so the DuckDB oracle can
reproduce it bit-for-bit; ``link_mentions`` then picks the best entity
per surface with a window top-1.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from rdf_n3_spark.operators.canon import verified_pairs


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _grams(s: str, n: int = 3) -> set:
    s = s.lower()
    return {s[i:i + n] for i in range(max(len(s) - n + 1, 1))}


# DataType object, not DDL string: the decorator must import without an
# active SparkSession (the driver contract module imports this file)
@pandas_udf(DoubleType())
def link_score(a: pd.Series, b: pd.Series) -> pd.Series:
    """Blended similarity ∈ [0,1]: 0.5·3-gram Jaccard +
    0.3·(1 − lev/maxlen) + 0.2·[4-char prefix match, case-folded]."""
    out = []
    for x, y in zip(a, b):
        x, y = str(x), str(y)
        ga, gb = _grams(x), _grams(y)
        jac = len(ga & gb) / len(ga | gb)
        lev = 1.0 - _levenshtein(x.lower(), y.lower()) / max(len(x), len(y), 1)
        pre = 1.0 if x.lower()[:4] == y.lower()[:4] else 0.0
        out.append(round(0.5 * jac + 0.3 * lev + 0.2 * pre, 9))
    return pd.Series(out)


def score_candidate_links(surfaces: DataFrame, threshold: float = 0.5) -> DataFrame:
    """LSH-blocked candidate pairs → (a, b, score), score ≥ threshold.

    Blocking bounds the pair count (operators/canon LSH bands + hot-
    bucket pruning); the Arrow-batched scorer then touches only the
    surviving candidates — the shape that keeps a 100 TB linker's
    Python work proportional to candidates, never to the corpus.
    """
    pairs = verified_pairs(surfaces, threshold=0.0).select("a", "b")
    scored = pairs.withColumn("score", link_score(F.col("a"), F.col("b")))
    return scored.where(F.col("score") >= threshold)


def link_mentions(mentions: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Each distinct surface → its best-scoring OTHER surface (the
    linked canonical candidate), ties broken lexicographically."""
    surfaces = mentions.select("surface").distinct()
    scored = score_candidate_links(surfaces, threshold=threshold)
    sym = scored.unionByName(
        scored.select(F.col("b").alias("a"), F.col("a").alias("b"), "score")
    )
    w = Window.partitionBy("a").orderBy(F.desc("score"), F.asc("b"))
    return (
        sym.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(F.col("a").alias("surface"), F.col("b").alias("linked_to"), "score")
    )
