"""Streaming decontamination (stream-static gram join + watermarked
doc dedup) and its batch equivalence."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from rdf_n3_spark.operators.curation import decontaminate
from rdf_n3_spark.streaming.filters import stream_contaminated_ids


def ts(m):
    return datetime.fromtimestamp(1700000000 + m * 60, tz=timezone.utc)


def _corpus(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", ts(0)),
        (2, "completely unrelated words here nothing shared at all", ts(1)),
        (3, "quick brown fox jumps again and again today", ts(2)),
        # doc 4 matches on TWO grams — must still be reported once
        (4, "the quick brown fox jumps high today friends", ts(3)),
    ]
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows],
                        "text": [r[1] for r in rows],
                        "ts": [r[2] for r in rows]})
    src = str(tmp_path / "docs")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    return src


def _bench(spark):
    return spark.createDataFrame(
        [(100, "watch the quick brown fox jumps high")],
        "doc_id bigint, text string",
    )


def test_stream_contaminated_ids_matches_batch(spark, tmp_path):
    src = _corpus(spark, tmp_path)
    bench = _bench(spark)
    stream = spark.readStream.schema(
        "doc_id bigint, text string, ts timestamp").parquet(src)
    out = stream_contaminated_ids(stream, bench, n=4)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("contam_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql(
        "SELECT DISTINCT doc_id FROM contam_out").collect()}
    # one row per contaminated doc, even with multiple matching grams
    n_rows = spark.sql("SELECT count(*) AS n FROM contam_out").collect()[0].n
    assert n_rows == len(got)
    batch = {
        r["doc_id"]
        for r in decontaminate(spark.read.parquet(src), bench, n=4).collect()
        if r["contaminated"]
    }
    assert got == batch == {1, 3, 4}
