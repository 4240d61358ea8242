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

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUAD_SCHEMA = (
    "doc_id string, pos int, s string, p string, o string, g string, ok boolean, err string"
)

#: format registry (reference format.rb:19-32 content negotiation):
#: extension → MIME; N-Triples ⊂ Turtle ⊂ N3, so one grammar covers all
FORMATS = {
    ".n3": "text/n3",
    ".ttl": "text/turtle",
    ".nt": "application/n-triples",
}


def format_for(path: str) -> str | None:
    """Extension dispatch; None = not an RDF text format we read."""
    return FORMATS.get(os.path.splitext(path)[1].lower())


def read_rdf(spark: SparkSession, path: str, base_uri: str = "") -> DataFrame:
    """Whole-file scan of .n3/.ttl/.nt documents → quad rows.

    One row per file (wholetext), file path as doc id, then the same
    Arrow-batched parse stage as any other document column — format
    dispatch is just the glob, because the N3 grammar is a superset of
    Turtle and N-Triples (reference format.rb registers one reader
    family for all three).
    """
    docs = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("doc_id"),
            F.col("value").alias("n3_text"),
        )
        .withColumn("base_uri", F.lit(base_uri))
    )
    return parse_documents(docs)


def parse_documents(docs: DataFrame, validate: bool = False,
                    canonicalize: bool = False) -> DataFrame:
    """(doc_id, n3_text[, base_uri]) → quad rows.

    Parse failures don't kill the job (a 100 TB corpus always contains
    malformed documents): failed docs yield one row with ok=false and
    the error message; downstream filters on ok.  ``validate`` /
    ``canonicalize`` ride into the per-document parser (reader.rb's
    option surface) — validate-mode rejections land on the SAME
    ok=false fault-isolation path as grammar errors, never the job.
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
                    quads = parse_n3(text, base_uri=base, validate=validate,
                                     canonicalize=canonicalize)
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
