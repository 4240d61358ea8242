"""N3 document scan: text column → quad rows, via Arrow-batched UDF.

The Spark mapping of rdf-n3's Reader (SURVEY.md §3.1): documents are
independent, so the parse stage is a pure map over an input DataFrame
of (doc_id, n3_text, base_uri) — ``mapInPandas`` so one Python worker
amortizes interpreter cost over a whole Arrow batch of documents. No
shuffle; output inherits input partitioning. At 100 TB the only knob is
input split size (``spark.sql.files.maxPartitionBytes``) and document
batching, both orthogonal to this code.

Emitted schema mirrors FIXTURES.md §3 / the reference's statement
stream: one row per quad, terms in canonical N-Triples-ish encoding,
plus per-document emission order ``pos`` (preserves reader emission
order for list-ladder reconstruction and debugging).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

QUAD_SCHEMA = (
    "doc_id string, pos int, s string, p string, o string, g string, ok boolean, err string"
)


def parse_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, n3_text[, base_uri]) → quad rows.

    Parse failures don't kill the job (a 100 TB corpus always contains
    malformed documents): failed docs yield one row with ok=false and
    the error message; downstream filters on ok.
    """
    cols = docs.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the worker so the UDF pickles no module state
        from rdf_n3_spark.functions.n3_parser import parse_n3

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "pos", "s", "p", "o", "g", "ok", "err")}
            for row in pdf.itertuples(index=False):
                doc_id = str(getattr(row, "doc_id"))
                text = getattr(row, "n3_text") or ""
                base = str(getattr(row, "base_uri", "") or "") if "base_uri" in cols else ""
                try:
                    quads = parse_n3(text, base_uri=base)
                    for i, (s, p, o, g) in enumerate(quads):
                        out["doc_id"].append(doc_id)
                        out["pos"].append(i)
                        out["s"].append(s)
                        out["p"].append(p)
                        out["o"].append(o)
                        out["g"].append(g)
                        out["ok"].append(True)
                        out["err"].append("")
                except Exception as ex:  # noqa: BLE001 — malformed doc, not a bug
                    out["doc_id"].append(doc_id)
                    out["pos"].append(-1)
                    for k in ("s", "p", "o", "g"):
                        out[k].append("")
                    out["ok"].append(False)
                    out["err"].append(str(ex)[:500])
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema=QUAD_SCHEMA)
