"""Exact duplicated-substring detection — the span-level dedup pass.

Document-level dedup (:mod:`.dedup`) drops whole near-identical
documents, but web corpora also repeat long PASSAGES inside otherwise
distinct documents (licenses, navigation chrome, quoted boilerplate).
The standard training-data treatment (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") removes any substring of
≥ k tokens that occurs more than once in the corpus.  The suffix-array
construction used there is single-machine; the distributed
re-expression here is the k-gram rolling-window equivalent: a token
span is duplicated iff every length-k window inside it is duplicated,
and the union of duplicated k-gram windows is exactly the set of
maximal duplicated spans at window resolution.

Everything is built-in Column expressions (md5 + slice + windows), so
the DuckDB oracle replays it bit-for-bit.

Scale shapes (the whole point of the re-expression):

* k-gram stream: one narrow map per document (bound token array +
  ``posexplode`` — linear in corpus tokens, no shuffle);
* duplicate test: ``groupBy(gram_hash).count()`` is map-side
  combinable (a gram repeated 10^9 times combines to one row per map
  task BEFORE the wire — the reason this is a groupBy + semi-join and
  NOT a ``count() over (partition by gram_hash)`` window, which would
  ship every occurrence of a hot gram to one reducer with no partial
  aggregation and no AQE split);
* position recovery: equi-join of the gram stream against the
  (aggregated, one-row-per-hash) duplicate set — AQE skew-split
  handles mega-hot grams because the build side is 1 row per key;
* span merge: classic gaps-and-islands windows partitioned by
  ``doc_id`` — per-document local sort after one shuffle on the
  document key, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K_TOKENS = 8  # minimum duplicated-substring length, in tokens


def kgram_positions(documents: DataFrame, k: int = K_TOKENS) -> DataFrame:
    """(doc_id, pos, gram_hash): md5 of every length-``k`` token
    window, 1-based start position.  Documents shorter than ``k``
    tokens emit nothing (no window of the required length exists).

    The projection references the bound token array TWICE (the window
    count via ``size`` and the lambda's ``slice``), which blocks
    CollapseProject from re-inlining the ``split`` into the HOF lambda
    (single-use aliases DO get inlined and re-tokenize per window —
    see :func:`~rdf_n3_spark.operators.dedup.doc_shingles`).  That
    makes a repartition barrier unnecessary here: no shuffle, at the
    cost of the pushed-down length filter re-running ``split`` once
    per row (O(len), vs a full corpus shuffle) — pinned by
    tests/test_plans.py::test_dup_spans_duplicate_test_is_partial_agg_join."""
    toks = (
        documents.select(F.col("doc_id"), F.split(F.lower("text"), " ").alias("t"))
        .where(F.size("t") >= k)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (k - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, k))),
    )
    return toks.select(
        "doc_id", F.posexplode(grams).alias("pos0", "gram_hash")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram_hash")


def dup_spans(documents: DataFrame, k: int = K_TOKENS) -> DataFrame:
    """(doc_id, span_start, span_end, span_len) — maximal merged token
    spans covered by k-gram windows that occur more than once in the
    corpus (1-based, inclusive).  Two overlapping or adjacent
    duplicated windows merge into one span; ``span_len`` counts the
    tokens a span-removal pass would drop."""
    g = kgram_positions(documents, k).localCheckpoint(eager=False)
    dup = (
        g.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("gram_hash")
    )
    hits = g.join(dup, "gram_hash").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + (k - 1)).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max("e").over(w_prev)
    new_island = F.when(
        prev_max.isNull() | (F.col("s") > prev_max), 1
    ).otherwise(0)
    islands = hits.withColumn("island", F.sum(new_island).over(w_run))
    return (
        islands.groupBy("doc_id", "island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id",
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_len"),
        )
    )


def substring_dup_stats(documents: DataFrame, k: int = K_TOKENS,
                        max_dup_pct: int = 50) -> DataFrame:
    """(doc_id, total_tokens, dup_tokens, keep) — the per-document
    duplication budget a curation pass filters on: ``dup_tokens`` is
    the token count inside merged duplicated spans (disjoint after the
    merge, so the sum is exact coverage), ``keep`` = 1 iff at most
    ``max_dup_pct`` percent of the document is duplicated substring.
    Integer arithmetic throughout (``dup*100 <= pct*total``) — no
    float ratio to drift across engines.  Every document appears,
    including those shorter than ``k`` tokens (zero duplicated spans
    by construction)."""
    per_doc = dup_spans(documents, k).groupBy("doc_id").agg(
        F.sum("span_len").alias("dup_tokens")
    )
    return (
        documents.select(
            "doc_id",
            F.size(F.split(F.lower("text"), " ")).cast("long").alias("total_tokens"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)) * 100
                <= F.lit(max_dup_pct) * F.col("total_tokens")
            ).cast("int").alias("keep"),
        )
    )
