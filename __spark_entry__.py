"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (the
correctness gate compares row counts, schemas and order-insensitive
value hashes at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_n3_spark.operators.mentions import extract_mentions
from rdf_n3_spark.operators.triples import entity_triples, mention_triples
from rdf_n3_spark.sources.transcripts import transcripts, transcripts_duckdb_cte

_T = transcripts_duckdb_cte()

# DuckDB mirror of extract_mentions (zipped-unnest = posexplode)
_MENTIONS = f"""
WITH {_T},
toks AS (
  SELECT conv_id, turn_idx,
         unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos,
         unnest(string_split(text, ' ')) AS surface
  FROM transcripts
),
mentions AS (
  SELECT conv_id, turn_idx, CAST(pos AS INT) AS pos, surface, lower(surface) AS norm
  FROM toks
  WHERE regexp_matches(surface, '^(?i)(part|supp)_[a-z0-9]+$')
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → mentions → skolemized triples (sf0.001)."""
    t = transcripts(spark, "/root/testdata/sf0.001")
    m = extract_mentions(t)
    return mention_triples(m).unionByName(entity_triples(m))


# ---------------------------------------------------------------- queries

def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


def _q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_mentions(transcripts(spark, sf_dir))


def _q_mention_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mention_triples(extract_mentions(transcripts(spark, sf_dir)))


def _q_entity_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entity_triples(extract_mentions(transcripts(spark, sf_dir)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_build": _q_transcripts,
        "mention_extract": _q_mentions,
        "triple_emit": _q_mention_triples,
        "entity_agg": _q_entity_triples,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_build": f"""
            WITH {_T}
            SELECT conv_id, turn_idx, role, text, tool,
                   CAST(epoch(ts) AS BIGINT) AS ts_epoch
            FROM transcripts
        """,
        "mention_extract": f"""
            {_MENTIONS}
            SELECT conv_id, turn_idx, pos, surface, norm FROM mentions
        """,
        "triple_emit": f"""
            {_MENTIONS},
            sk AS (
              SELECT *, 'sk:' || substr(sha256(conv_id || '|' || CAST(turn_idx AS VARCHAR)
                         || '|' || CAST(pos AS VARCHAR)), 1, 16) AS sk
              FROM mentions
            )
            SELECT sk AS s, 'rdf:type' AS p, ':Mention' AS o FROM sk
            UNION ALL SELECT sk, ':surface', surface FROM sk
            UNION ALL SELECT sk, ':inConv', 'conv:' || conv_id FROM sk
            UNION ALL SELECT sk, ':atTurn', CAST(turn_idx AS VARCHAR) FROM sk
            UNION ALL SELECT sk, ':refersTo', 'ent:' || norm FROM sk
        """,
        "entity_agg": f"""
            {_MENTIONS}
            SELECT 'ent:' || norm AS s, ':mentionCount' AS p,
                   CAST(count(*) AS VARCHAR) AS o
            FROM mentions GROUP BY norm
        """,
    }
