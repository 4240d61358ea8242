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

Scale shape: one tokenize pass (whole-stage codegen), the mention
self-join is keyed on (conv_id, turn_idx) — per-turn mention counts
are bounded by turn length, so the join is linear in turns with no
global hot key — and the predicate slice joins the token array back
by the same turn key (arrays travel once per surviving pair, not once
per mention).  The final aggregation is map-side-combinable on the
(subject, predicate, object) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_n3_spark.operators.mentions import extract_mentions


def relation_candidates(transcripts: DataFrame, max_gap: int = 3,
                        min_support: int = 2,
                        mentions: DataFrame | None = None) -> DataFrame:
    """(s_norm, pred, o_norm, n_support, n_convs) — candidate relation
    triples: ordered mention pairs within one turn separated by 1 to
    ``max_gap`` predicate tokens (lowercased, space-joined middle
    span; empty = the mentions are adjacent), kept when the same
    (subject, predicate, object) pattern occurs ≥ ``min_support``
    times corpus-wide.  ``n_convs`` = distinct conversations the
    pattern appears in (a pattern stuck inside ONE conversation is a
    quote-loop, not a relation).

    ``mentions``: pre-staged ``extract_mentions`` output — the batch
    job materializes mentions once (_SUCCESS-gated) and feeds every
    consumer from the staged table, so passing it here avoids a second
    full tokenize pass over the corpus."""
    m = (mentions if mentions is not None
         else extract_mentions(transcripts)).select(
        "conv_id", "turn_idx", "pos", "norm")
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(b, ["conv_id", "turn_idx"]).where(
        (F.col("b.pos") > F.col("a.pos"))
        & (F.col("b.pos") - F.col("a.pos") <= max_gap + 1)
    ).select(
        "conv_id", "turn_idx",
        F.col("a.norm").alias("s_norm"), F.col("a.pos").alias("sp"),
        F.col("b.norm").alias("o_norm"), F.col("b.pos").alias("op"),
    )
    turn_toks = transcripts.select(
        "conv_id", "turn_idx", F.split(F.lower("text"), " ").alias("toks"))
    labeled = pairs.join(turn_toks, ["conv_id", "turn_idx"]).select(
        "conv_id", "s_norm", "o_norm",
        F.array_join(
            F.slice(F.col("toks"), F.col("sp") + 2,
                    F.col("op") - F.col("sp") - 1),
            " ",
        ).alias("pred"),
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
                     min_convs: int = 2,
                     mentions: DataFrame | None = None) -> DataFrame:
    """(s, p, o) — mined relations as KG triples, closing the loop
    from prose to store: subjects/objects under the same ``ent:``
    namespace the mention pipeline emits (so they join the
    canonicalization and materialization stages unchanged), predicate
    = ``:rel_`` + the underscored middle span (``:rel_`` alone =
    adjacency).  ``min_convs`` adds the conversation-spread floor on
    top of raw support — the filter that drops quote-loops.  Union
    this with `mention_triples ∪ entity_triples` and the downstream
    graph_nodes/graph_edges/char-set machinery consumes it as-is."""
    cand = relation_candidates(transcripts, max_gap, min_support,
                               mentions=mentions)
    return cand.where(F.col("n_convs") >= min_convs).select(
        F.concat(F.lit("ent:"), F.col("s_norm")).alias("s"),
        F.concat(F.lit(":rel_"),
                 F.regexp_replace(F.col("pred"), " ", "_")).alias("p"),
        F.concat(F.lit("ent:"), F.col("o_norm")).alias("o"),
    )
