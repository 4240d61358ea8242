"""Streaming exact deduplication — the Structured-Streaming complement
of :func:`rdf_n3_spark.operators.dedup.exact_dedup` for continuous
corpus ingest: the first-arriving copy of each content hash passes,
later copies are dropped, and the dedup state is BOUNDED by a
watermark instead of growing with the corpus.

Scale shape: ``dropDuplicatesWithinWatermark`` keeps one state row per
distinct hash seen within the watermark horizon, partitioned by the
hash (the same key the batch operator groups on), and expires rows as
the event-time watermark passes them — so a 100 TB/day feed holds
state proportional to one horizon's worth of DISTINCT documents, not
the stream's history.  Exactly-once across restarts comes from the
same checkpoint/lineage discipline as :mod:`.ingest`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(stream: DataFrame, ts_col: str = "ts",
                       text_col: str = "text",
                       watermark: str = "10 minutes") -> DataFrame:
    """First-arrival winner per md5(text) within the watermark horizon.

    Two copies inside one horizon dedup exactly; copies farther apart
    than the watermark MAY both pass (state for the first has been
    reclaimed) — the standard streaming-dedup contract, with the batch
    operator as the exact end-of-day sweep."""
    keyed = stream.withColumn("text_hash", F.md5(F.col(text_col)))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
