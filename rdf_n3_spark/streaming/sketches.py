"""Continuous sketch rollups: per-epoch KMV / count-min sketch state
appended by a stream, folded exactly on read.

The batch sketches (:mod:`rdf_n3_spark.operators.sketch`) are
MERGEABLE — bottom-k over unioned bottom-k's is the global bottom-k,
counter tables sum elementwise — so a stream doesn't need stateful
aggregation to maintain them: each micro-batch writes its OWN tiny
sketch (≤ keys×k rows / ≤ depth×width rows) to an epoch partition, and
any reader folds the epochs into the exact sketch of everything seen.
This is the production "daily sketch → monthly estimate" pipeline as a
continuous job, with per-epoch state instead of an ever-growing store.

Exactly-once: the same epoch-partitioned DYNAMIC-overwrite discipline
as the ingest gates (:mod:`.dedup`) — a crash-replayed epoch
overwrites its own partition (same batch ⇒ same sketch ⇒ identical
partition contents), never appending a second copy that would bias the
fold (KMV would survive a duplicate epoch — bottom-k is idempotent —
but count-min counters would double-count; the sink discipline makes
both exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_n3_spark.operators.sketch import (
    cms_lookup,
    cms_merge_all,
    cms_sketch,
    kmv_estimate,
    kmv_merge_all,
    kmv_sketch,
)


def stream_kmv_rollup(stream: DataFrame, out_dir: str, checkpoint_dir: str,
                      key: str, value_col: str, k: int = 64):
    """Write one KMV sketch row per key per epoch to ``out_dir``
    (epoch-partitioned, via the shared
    :func:`rdf_n3_spark.streaming.sink.epoch_overwrite_sink`).
    Finish with :func:`read_kmv_rollup`."""
    from rdf_n3_spark.streaming.sink import epoch_overwrite_sink

    return epoch_overwrite_sink(
        stream, out_dir, checkpoint_dir,
        lambda batch_df, _e: kmv_sketch(batch_df, key, F.col(value_col), k=k))


def read_kmv_rollup(spark: SparkSession, out_dir: str, key: str,
                    k: int = 64) -> DataFrame:
    """(key, n_seen, kth_hash, est_distinct) — fold every epoch's
    sketch and finish: EQUALS `kmv_distinct` over the full history
    (pinned by tests/test_streaming_sketches.py)."""
    return kmv_estimate(
        kmv_merge_all(spark.read.parquet(out_dir), key, k=k), key, k=k)


def stream_cms_rollup(stream: DataFrame, out_dir: str, checkpoint_dir: str,
                      value_col: str, depth: int = 4, width: int = 8192):
    """Write one count-min sketch (≤ depth×width rows) per epoch to
    ``out_dir`` (shared epoch-overwrite sink).  Probe with
    :func:`read_cms_rollup`."""
    from rdf_n3_spark.streaming.sink import epoch_overwrite_sink

    return epoch_overwrite_sink(
        stream, out_dir, checkpoint_dir,
        lambda batch_df, _e: cms_sketch(batch_df, F.col(value_col),
                                        depth=depth, width=width))


def read_cms_rollup(spark: SparkSession, out_dir: str, probes: DataFrame,
                    value, depth: int = 4, width: int = 8192) -> DataFrame:
    """(v, est_count) — fold every epoch's counters and probe: EQUALS
    `cms_lookup` over a whole-history sketch (counter sums are exact)."""
    merged = cms_merge_all(spark.read.parquet(out_dir))
    return cms_lookup(merged, probes, value, depth=depth, width=width)


def stream_bloom_rollup(stream: DataFrame, out_dir: str, checkpoint_dir: str,
                        value_col: str, m_bits: int = 8192,
                        k_hashes: int = 3):
    """Write one Bloom filter (≤ m_bits/63 rows) per epoch to
    ``out_dir`` (shared epoch-overwrite sink).  Membership is
    idempotent under replay anyway (set bits stay set), but the sink
    discipline keeps all three sketch families on one contract.
    Probe with :func:`read_bloom_rollup`."""
    from rdf_n3_spark.operators.sketch import bloom_sketch
    from rdf_n3_spark.streaming.sink import epoch_overwrite_sink

    return epoch_overwrite_sink(
        stream, out_dir, checkpoint_dir,
        lambda batch_df, _e: bloom_sketch(batch_df, F.col(value_col),
                                          m_bits=m_bits, k_hashes=k_hashes))


def read_bloom_rollup(spark: SparkSession, out_dir: str, probes: DataFrame,
                      value, m_bits: int = 8192,
                      k_hashes: int = 3) -> DataFrame:
    """(v, maybe_present) — bit_or-fold every epoch's filter and
    probe: EQUALS `bloom_probe` against a whole-history filter (the
    fold is exact — set bits only accumulate)."""
    from rdf_n3_spark.operators.sketch import bloom_merge_all, bloom_probe

    merged = bloom_merge_all(spark.read.parquet(out_dir))
    return bloom_probe(merged, probes, value,
                       m_bits=m_bits, k_hashes=k_hashes)


def stream_conversation_rollup(stream: DataFrame, out_dir: str,
                               checkpoint_dir: str):
    """Per-epoch PARTIAL conversation stats (the same mergeable-state
    discipline as the sketches — counts and sums add, first/last
    timestamps min/max): each micro-batch of transcript turns writes
    its per-conversation partials to an epoch partition; a
    conversation whose turns span epochs folds exactly on read.
    Finish with :func:`read_conversation_rollup`."""
    from rdf_n3_spark.operators.conversations import conversation_stats
    from rdf_n3_spark.streaming.sink import epoch_overwrite_sink

    return epoch_overwrite_sink(
        stream, out_dir, checkpoint_dir,
        lambda batch_df, _e: conversation_stats(batch_df)
        .drop("duration_seconds"))


def read_conversation_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold every epoch's partials: EQUALS
    `conversations.conversation_stats` over the full turn history
    (duration recomputed from the folded min/max — a duration is NOT
    additive across epochs)."""
    df = spark.read.parquet(out_dir)
    return (
        df.groupBy("conv_id")
        .agg(
            F.sum("n_turns").cast("bigint").alias("n_turns"),
            F.sum("n_user").cast("bigint").alias("n_user"),
            F.sum("n_assistant").cast("bigint").alias("n_assistant"),
            F.sum("n_tool_role").cast("bigint").alias("n_tool_role"),
            F.sum("n_tool_calls").cast("bigint").alias("n_tool_calls"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumn(
            "duration_seconds",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts"))
            .cast("bigint"))
    )


def stream_transition_rollup(stream: DataFrame, out_dir: str,
                             checkpoint_dir: str):
    """Continuous :func:`~rdf_n3_spark.operators.conversations.
    turn_transitions` — the non-additive member of this family: a
    hand-off pair's two turns can land in different micro-batches, so
    each epoch writes within-epoch pair partials PLUS its open
    boundary turns (``conversations.transition_partials``), and the
    reader completes cross-epoch pairs at fold time.  Same
    epoch-overwrite exactly-once discipline as every rollup here.
    Finish with :func:`read_transition_rollup`."""
    from rdf_n3_spark.operators.conversations import transition_partials
    from rdf_n3_spark.streaming.sink import epoch_overwrite_sink

    return epoch_overwrite_sink(
        stream, out_dir, checkpoint_dir,
        lambda batch_df, _e: transition_partials(batch_df))


def read_transition_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold every epoch's transition state: EQUALS
    `conversations.turn_transitions` over the full turn history under
    the dense-turn_idx contract (pinned by
    tests/test_streaming_sketches.py, including a conversation whose
    hand-off pair straddles two epochs).

    A forward-open turn from one epoch meets its idx+1 partner — a
    backward-open turn from ANOTHER epoch — in one equi-join on
    (conv_id, turn_idx); the completed pairs then fold with the
    within-epoch partials.  n_convs stays exact because partials are
    conv-keyed until the final 9-key aggregate."""
    return fold_transition_partials(spark.read.parquet(out_dir))


def fold_transition_partials(df: DataFrame) -> DataFrame:
    """The fold of :func:`read_transition_rollup`, factored over an
    already-loaded state table (columns = ``transition_partials``
    output + ``epoch``) so the fold==batch property can be exercised
    over arbitrary epoch splits without a streaming run."""
    pairs = df.where(F.col("kind") == "p").select(
        "conv_id", "role_from", "role_to", "n", "total_gap_s", "max_gap_s")
    f = df.where(F.col("kind") == "f").select(
        "conv_id", F.col("epoch").alias("f_epoch"),
        (F.col("turn_idx") + 1).alias("turn_idx"),
        F.col("role").alias("role_from"), F.col("es").alias("es_from"))
    b = df.where(F.col("kind") == "b").select(
        "conv_id", F.col("epoch").alias("b_epoch"), "turn_idx",
        F.col("role").alias("role_to"), F.col("es").alias("es_to"))
    crossed = (
        f.join(b, ["conv_id", "turn_idx"])
        # defensive: a same-epoch match is impossible by construction
        # (if both turns shared an epoch, neither would be open)
        .where(F.col("f_epoch") != F.col("b_epoch"))
        .select(
            "conv_id", "role_from", "role_to",
            F.lit(1).cast("bigint").alias("n"),
            (F.col("es_to") - F.col("es_from")).cast("bigint")
            .alias("total_gap_s"),
            (F.col("es_to") - F.col("es_from")).cast("bigint")
            .alias("max_gap_s"))
    )
    return (
        pairs.unionByName(crossed)
        .groupBy("role_from", "role_to")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
            F.sum("total_gap_s").cast("bigint").alias("total_gap_seconds"),
            F.max("max_gap_s").cast("bigint").alias("max_gap_seconds"),
        )
    )
