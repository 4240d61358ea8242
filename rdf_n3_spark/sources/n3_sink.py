"""N3 serialization sink: quad rows → one N3 document per group.

The distributed form of the reference's writer surface
(``log:n3String``, lib/rdf/n3/algebra/log/n3_string.rb:13-22, and the
Writer epilogue, writer.rb:157-198): graphs are independent documents,
so serialization is a grouped Arrow-batched stage — one Python worker
serializes a whole batch of graphs; output inherits the group
partitioning. The actual text rules (prefix compaction, predicate
sugar, collections, bnode property lists) live in
functions/n3_writer.N3Writer, shared verbatim between this distributed
sink and driver-side debugging.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "doc_id string, n3 string"


def serialize_graphs(quads: DataFrame, group_col: str = "doc_id") -> DataFrame:
    """(doc_id, s, p, o[, g]) rows → (doc_id, n3) documents.

    ``applyInPandas`` over the group key: the shuffle brings each
    document's statements to one worker (documents are small; the
    corpus is many documents — the classic "lots of small groups"
    shape that groupBy handles without skew).
    """
    has_g = "g" in quads.columns

    def write(pdf: pd.DataFrame) -> pd.DataFrame:
        from rdf_n3_spark.functions.n3_writer import N3Writer

        doc = str(pdf[group_col].iloc[0])
        rows = pdf.sort_values(["s", "p", "o"])
        qs = [
            (r.s, r.p, r.o, (r.g if has_g else ""))
            for r in rows.itertuples(index=False)
        ]
        return pd.DataFrame({"doc_id": [doc], "n3": [N3Writer(qs).serialize()]})

    return quads.groupBy(group_col).applyInPandas(write, schema=OUT_SCHEMA)
