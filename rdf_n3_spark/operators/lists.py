"""RDF collection (list) expansion/contraction as DataFrame transforms.

The reference keeps lists first-class (lib/rdf/n3/list.rb) and expands
them to the ``rdf:first`` / ``rdf:rest`` ladder on demand
(repository.rb:128-143 ``each_expanded_statement``; reader emission
reader.rb:572-580).  Ladder subjects are deterministic:
``"#{head_id}_#{ndx}"`` (list.rb:396) — which is exactly what makes the
transform expressible as pure Column expressions: every cell id is a
function of (head id, position), no sequential state.

Both directions are shuffle-free on the expansion side (posexplode is
a map-side lateral view); contraction is a pos-keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
FIRST = f"<{RDF}first>"
REST = f"<{RDF}rest>"
NIL = f"<{RDF}nil>"


#: cell-id separator. The reference uses "_" (list.rb:396
#: ``"#{head_id}_#{ndx}"``), but this engine's head ids can themselves
#: end in ``_<digits>`` (skolem ids like ``ent:part_4``), which would
#: make contraction ambiguous (``h`` vs ``h_1`` collide).  A separator
#: that cannot appear in term ids keeps (head, pos) recoverable; cell
#: ids are bnode-like internals, so triple-set parity is unaffected.
SEP = "#_"


def _cell(head, pos):
    """Deterministic ladder-cell id: head for position 0,
    ``head#_<ndx>`` after (see SEP)."""
    return F.when(pos == 0, head).otherwise(
        F.concat(head, F.lit(SEP), pos.cast("string"))
    )


def expand_list_column(df: DataFrame, head_col: str, arr_col: str) -> DataFrame:
    """Array column → rdf:first/rdf:rest ladder triples.

    One posexplode + a 2-struct explode per element: cell ndx gets
    (cell, rdf:first, element) and (cell, rdf:rest, next-cell-or-nil).
    Empty arrays emit nothing (an empty N3 collection IS rdf:nil — no
    ladder exists).  Zero shuffles; fully codegen'd.
    """
    e = df.select(
        F.col(head_col).alias("__h"),
        F.size(F.col(arr_col)).alias("__n"),
        F.posexplode(F.col(arr_col)).alias("__pos", "__v"),
    )
    head, pos = F.col("__h"), F.col("__pos")
    cell = _cell(head, pos)
    nxt = F.when(pos == F.col("__n") - 1, F.lit(NIL)).otherwise(_cell(head, pos + 1))
    pair = F.array(
        F.struct(cell.alias("s"), F.lit(FIRST).alias("p"), F.col("__v").cast("string").alias("o")),
        F.struct(cell.alias("s"), F.lit(REST).alias("p"), nxt.alias("o")),
    )
    return e.select(F.explode(pair).alias("t")).select("t.s", "t.p", "t.o")


def contract_ladders(triples: DataFrame) -> DataFrame:
    """rdf:first/rdf:rest ladder triples → (head, array) rows — the
    inverse transform (reader-side list folding, reader.rb:572-580).

    Relies on the deterministic cell-id contract above: a cell's head
    and position are recoverable from its id (``head`` or
    ``head#_<ndx>``, SEP chosen so no head id can end that way), so
    contraction needs NO iterative pointer chase — one regexp
    projection plus one groupBy, instead of O(list length) self-joins.
    Ladders produced by third-party writers (opaque cell ids) would
    need the iterative variant; ours never does.
    """
    firsts = triples.where(F.col("p") == FIRST)
    cell = F.col("s")
    head = F.regexp_replace(cell, r"#_\d+$", "")
    pos = F.coalesce(
        F.nullif(F.regexp_extract(cell, r"#_(\d+)$", 1), F.lit("")).cast("int"),
        F.lit(0),
    )
    return (
        firsts.select(head.alias("head"), F.struct(pos.alias("i"), F.col("o").alias("v")).alias("__e"))
        .groupBy("head")
        .agg(F.sort_array(F.collect_list("__e")).alias("__es"))
        .select("head", F.transform("__es", lambda e: e["v"]).alias("items"))
    )
