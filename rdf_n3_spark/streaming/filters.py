"""Streaming curation filters — the filter-at-ingest complement of
:mod:`rdf_n3_spark.operators.curation` for continuous corpus feeds.

:func:`stream_contaminated_ids` composes two bounded streaming
primitives:

1. a STATELESS stream-static equi-join: each micro-batch's exploded
   word n-grams join the (static, broadcast) benchmark gram set — no
   streaming state at all, the static side is planned like any batch
   broadcast join;
2. ``dropDuplicatesWithinWatermark`` on doc_id, so a document that
   matches on many grams is reported once, with state bounded by one
   watermark horizon's worth of DISTINCT contaminated documents (a
   small minority of the feed by construction — eval suites are tiny
   next to a corpus).

The emitted stream is the quarantine list; batch
:func:`~rdf_n3_spark.operators.curation.decontaminate` is the exact
end-of-day sweep (same grams, same tokenization), and the two agree
exactly inside one horizon — pinned by
tests/test_streaming_filters.py's batch-equivalence test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import shingles_of_tokens


def stream_contaminated_ids(stream: DataFrame, benchmark: DataFrame,
                            n: int = 4, ts_col: str = "ts",
                            text_col: str = "text",
                            watermark: str = "10 minutes") -> DataFrame:
    """(doc_id, ts) stream of documents sharing a word ``n``-gram with
    the static ``benchmark`` set — first detection per doc_id within
    the watermark horizon."""
    bench_grams = (
        benchmark.select("doc_id",
                         F.split(F.lower(text_col), " ").alias("__toks"))
        .select(F.explode(shingles_of_tokens(F.col("__toks"), n)).alias("g"))
        .distinct()
    )
    grams = (
        stream.select("doc_id", ts_col,
                      F.split(F.lower(text_col), " ").alias("__toks"))
        .select("doc_id", ts_col,
                F.explode(shingles_of_tokens(F.col("__toks"), n)).alias("g"))
    )
    return (
        grams.join(F.broadcast(bench_grams), "g")
        .select("doc_id", ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["doc_id"])
    )
