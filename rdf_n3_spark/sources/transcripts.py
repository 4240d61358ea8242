"""Deterministic synthetic transcripts in the BASELINE.json input_hint shape.

Input contract (BASELINE.json ``input_hint``): an Iceberg/parquet table of
multi-turn transcripts with columns

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

The sandbox has no external data, so the table is *derived
deterministically* from the driver-generated ``lineitem`` parquet: one
lineitem row = one turn; an order = one conversation. The derivation is
pure relational algebra (no UDF, no randomness), so the exact same table
is constructible in DuckDB for the correctness oracle, and it scales
linearly with the source table (600k turns at sf0.1, 10^12 at the real
target — the derivation is a narrow projection + one window).

Ground truth embedded in ``text``:
  * entity mentions — tokens ``part_<k>`` / ``supp_<k>`` (the synthetic
    equivalent of surface forms in agent transcripts);
  * a *hub entity* — every 5th order mentions ``part_hub`` instead of its
    real part, giving one entity ~20% of all mentions (exercises salted
    aggregation / AQE skew-join, per the north rule);
  * case variants — every 4th line uppercases the part token
    (``PART_12``), giving canonicalization a non-trivial clustering task;
  * an inline N3 snippet on turn 0 of each conversation
    (``:part_12 :suppliedBy :supp_3 .``) so the real N3 parser stage has
    per-turn ground truth.

Per-turn text equality under stable (conv_id, turn_idx) ordering — the
input_hint invariant — holds because turn_idx is a row_number over a
deterministic total order of a deterministic projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: total order inside a conversation (verified unique on the testdata)
_TURN_ORDER = ["l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]

TRANSCRIPT_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def transcripts(spark: SparkSession, sf_dir: str, mult: int = 1) -> DataFrame:
    """lineitem parquet → transcripts DataFrame (input_hint shape).

    Scale shape: one narrow scan (7 of 11 columns pruned in), one
    window over the conversation key — exactly the per-conversation
    repartition the downstream pipeline needs anyway, so the shuffle is
    reused, not added.

    ``mult`` (bench-only) replicates the corpus deterministically —
    ``mult`` copies of every conversation under distinct conv ids, same
    conversation-length distribution — so throughput runs can size the
    input to the parallelism level without new data files.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if mult > 1:
        # spread the (few-row-group) source scan across the cluster
        # BEFORE replicating, so the inflation stage is parallel — the
        # pre-shuffle moves only the small un-replicated rows
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
        rep = spark.range(mult).select(F.col("id").alias("__rep"))
        li = li.repartition(sp).crossJoin(rep).withColumn(
            "l_orderkey", F.col("l_orderkey") * mult + F.col("__rep")
        ).drop("__rep")
    w = Window.partitionBy("l_orderkey").orderBy(*_TURN_ORDER)
    part_tok = F.when(F.col("l_orderkey") % 5 == 0, F.lit("part_hub")).otherwise(
        F.concat(F.lit("part_"), F.col("l_partkey").cast("string"))
    )
    part_tok = F.when(F.col("l_linenumber") % 4 == 0, F.upper(part_tok)).otherwise(part_tok)
    supp_tok = F.concat(F.lit("supp_"), F.col("l_suppkey").cast("string"))
    turn_idx = (F.row_number().over(w) - F.lit(1)).cast("int")

    base = li.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("l_orderkey").cast("string"), 8, "0")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        part_tok.alias("_part_tok"),
        supp_tok.alias("_supp_tok"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("_qty"),
        F.col("l_returnflag").alias("_flag"),
        F.col("l_shipdate").alias("ts"),
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("turn_idx") % 3 + 1).cast("int"),
    )
    body = F.concat_ws(
        " ",
        F.lit("turn"),
        F.col("turn_idx").cast("string"),
        F.lit("mentions"),
        F.col("_part_tok"),
        F.lit("qty"),
        F.col("_qty").cast("string"),
        F.lit("from"),
        F.col("_supp_tok"),
        F.lit("flag"),
        F.col("_flag"),
    )
    n3 = F.concat(
        F.lit(":"), F.lower(F.col("_part_tok")),
        F.lit(" :suppliedBy :"), F.col("_supp_tok"), F.lit(" ."),
    )
    text = F.when(F.col("turn_idx") == 0, F.concat_ws(" ", body, n3)).otherwise(body)
    return base.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("lookup")).otherwise(F.lit("")).alias("tool"),
        "ts",
    )


def transcripts_duckdb_cte() -> str:
    """The *same* derivation as ANSI SQL over the pre-registered
    ``lineitem`` view, for DuckDB oracle queries. Must stay in exact
    value-level lockstep with :func:`transcripts`."""
    return """
transcripts AS (
  SELECT
    'conv_' || lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS conv_id,
    CAST(turn_rn - 1 AS INT) AS turn_idx,
    CASE CAST((turn_rn - 1) % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    CASE WHEN turn_rn - 1 = 0
         THEN body || ' ' || ':' || lower(part_tok) || ' :suppliedBy :' || supp_tok || ' .'
         ELSE body END AS text,
    CASE WHEN CAST((turn_rn - 1) % 3 AS INT) = 2 THEN 'lookup' ELSE '' END AS tool,
    l_shipdate AS ts
  FROM (
    SELECT *,
      'turn ' || CAST(turn_rn - 1 AS VARCHAR) || ' mentions ' || part_tok
        || ' qty ' || CAST(qty AS VARCHAR) || ' from ' || supp_tok
        || ' flag ' || l_returnflag AS body
    FROM (
      SELECT
        l_orderkey, l_returnflag, l_shipdate,
        row_number() OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS turn_rn,
        CASE WHEN l_linenumber % 4 = 0 THEN upper(pt) ELSE pt END AS part_tok,
        'supp_' || CAST(l_suppkey AS VARCHAR) AS supp_tok,
        CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM (
        SELECT *,
          CASE WHEN l_orderkey % 5 = 0 THEN 'part_hub'
               ELSE 'part_' || CAST(l_partkey AS VARCHAR) END AS pt
        FROM lineitem
      )
    )
  )
)
"""
