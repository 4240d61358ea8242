"""Relation extraction: pattern-based candidate triples between
co-occurring mentions.

The KG-construction step between entity canonicalization and graph
materialization: two entity mentions in the same turn, close together,
with the tokens BETWEEN them as the predicate surface — the classic
pattern-mining recipe (Hearst 1992's lexico-syntactic patterns;
distant-supervision pipelines mine the same (subject, middle-tokens,
object) table before any classifier).  Corpus-level support counts
separate real relation surfaces (":suppliedBy" appearing thousands of
times between part and supplier mentions) from incidental adjacency.

Reference scope note: rdf-n3 consumes triples already asserted in N3
text (reader.rb) — it never mines them from prose; this operator is
the beyond-reference pipeline stage that FEEDS such a store from raw
transcripts.

Scale shape: ONE tokenize pass and ZERO joins — mention positions,
pair generation, and the middle-span slice all happen inside the
turn's own token array (higher-order Column functions), so nothing
shuffles until the final (subject, predicate, object) aggregation,
which is map-side-combinable.  Per-turn mention counts are bounded by
turn length, so the in-array pair nest is O(m²) over a SMALL m and
the stage stays linear in turns with no hot key.  This replaced the
earlier (conv_id, turn_idx)-keyed mention self-join + token-array
re-join: interleaved A/B at 6M turns measured 3.4 s vs 5.0 s min —
the two dropped shuffles (12M mention rows ×2 + 6M array-carrying
rows) buy more than the interpreted-HOF lambdas cost, the opposite
trade from mentions.py's explode-vs-HOF note, because here the
alternative removes exchanges, not just an explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_n3_spark.operators.mentions import MENTION_RE


def relation_candidates(transcripts: DataFrame, max_gap: int = 3,
                        min_support: int = 2) -> DataFrame:
    """(s_norm, pred, o_norm, n_support, n_convs) — candidate relation
    triples: ordered mention pairs within one turn separated by 1 to
    ``max_gap`` predicate tokens (lowercased, space-joined middle
    span; empty = the mentions are adjacent), kept when the same
    (subject, predicate, object) pattern occurs ≥ ``min_support``
    times corpus-wide.  ``n_convs`` = distinct conversations the
    pattern appears in (a pattern stuck inside ONE conversation is a
    quote-loop, not a relation)."""
    toks = transcripts.select(
        "conv_id", F.split(F.lower("text"), " ").alias("toks"))
    ms = F.filter(
        F.transform(
            "toks", lambda t, i: F.struct(i.alias("pos"), t.alias("tok"))),
        lambda s: s["tok"].rlike(MENTION_RE),
    )
    pairs = F.flatten(F.transform(
        F.col("ms"),
        lambda a: F.transform(
            F.filter(
                F.col("ms"),
                lambda b: (b["pos"] > a["pos"])
                & (b["pos"] - a["pos"] <= max_gap + 1)),
            lambda b: F.struct(
                a["pos"].alias("sp"), a["tok"].alias("s_norm"),
                b["pos"].alias("op"), b["tok"].alias("o_norm")),
        ),
    ))
    labeled = (
        toks.select("conv_id", "toks", ms.alias("ms"))
        .select("conv_id", "toks", F.explode(pairs).alias("pr"))
        .select(
            "conv_id",
            F.col("pr.s_norm").alias("s_norm"),
            F.col("pr.o_norm").alias("o_norm"),
            F.array_join(
                F.slice(F.col("toks"), F.col("pr.sp") + 2,
                        F.col("pr.op") - F.col("pr.sp") - 1),
                " ",
            ).alias("pred"),
        )
    )
    return (
        labeled.groupBy("s_norm", "pred", "o_norm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_support"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        )
        .where(F.col("n_support") >= min_support)
    )


def relation_triples(transcripts: DataFrame, max_gap: int = 3,
                     min_support: int = 2,
                     min_convs: int = 2) -> DataFrame:
    """(s, p, o) — mined relations as KG triples, closing the loop
    from prose to store: subjects/objects under the same ``ent:``
    namespace the mention pipeline emits (so they join the
    canonicalization and materialization stages unchanged), predicate
    = ``:rel_`` + the underscored middle span (``:rel_`` alone =
    adjacency).  ``min_convs`` adds the conversation-spread floor on
    top of raw support — the filter that drops quote-loops.  Union
    this with `mention_triples ∪ entity_triples` and the downstream
    graph_nodes/graph_edges/char-set machinery consumes it as-is."""
    cand = relation_candidates(transcripts, max_gap, min_support)
    return cand.where(F.col("n_convs") >= min_convs).select(
        F.concat(F.lit("ent:"), F.col("s_norm")).alias("s"),
        F.concat(F.lit(":rel_"),
                 F.regexp_replace(F.col("pred"), " ", "_")).alias("p"),
        F.concat(F.lit("ent:"), F.col("o_norm")).alias("o"),
    )
