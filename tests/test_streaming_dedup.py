"""Streaming exact dedup (dropDuplicatesWithinWatermark)."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import functions as F

from rdf_n3_spark.operators.dedup import exact_dedup
from rdf_n3_spark.streaming.dedup import stream_exact_dedup


def ts(m):
    return datetime.fromtimestamp(1700000000 + m * 60, tz=timezone.utc)


def _drop(spark, tmp_path):
    rows = [
        ("a text", ts(0)), ("a text", ts(1)), ("a text", ts(2)),
        ("b text", ts(0)),
        ("c text", ts(3)), ("c text", ts(4)),
    ]
    pdf = pd.DataFrame({"text": [r[0] for r in rows],
                        "ts": [r[1] for r in rows]})
    src = str(tmp_path / "docs")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    return src


def test_stream_dedup_one_survivor_per_hash(spark, tmp_path):
    src = _drop(spark, tmp_path)
    stream = spark.readStream.schema("text string, ts timestamp").parquet(src)
    out = stream_exact_dedup(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text_hash, count(*) AS n FROM dedup_out GROUP BY 1").collect()
    assert {r.text_hash: r.n for r in got} == {
        r.text_hash: 1
        for r in spark.read.parquet(src)
        .select(F.md5("text").alias("text_hash")).distinct().collect()
    }


def test_stream_dedup_matches_batch_survivor_set(spark, tmp_path):
    """The streamed survivor hash set equals the batch exact_dedup
    groups (the end-of-day sweep the streaming pass approximates)."""
    src = _drop(spark, tmp_path)
    stream = spark.readStream.schema("text string, ts timestamp").parquet(src)
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory").queryName("dedup_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {r.text_hash for r in spark.sql("SELECT text_hash FROM dedup_out2").collect()}
    batch = exact_dedup(
        spark.read.parquet(src).withColumn("doc_id", F.monotonically_increasing_id())
    )
    assert streamed == {r.text_hash for r in batch.collect()}


def test_stream_neardup_gate_matches_batch_verdict(spark, tmp_path):
    """The streamed keep-set equals the batch incremental_neardup
    verdict on the same batch (the gate IS the batch operator run per
    epoch), and corpus near-dups never reach the sink."""
    from rdf_n3_spark.operators.dedup import incremental_neardup
    from rdf_n3_spark.streaming.dedup import stream_neardup_gate

    template = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1, template), (2, "unrelated corpus content " * 8)],
        ["doc_id", "text"])
    batch_rows = [(100, template + " x"),            # corpus near-dup
                  (101, " ".join(f"z{i}" for i in range(40))),  # unique
                  (102, " ".join(f"z{i}" for i in range(40)) + " t")]  # dup of 101
    src = str(tmp_path / "in")
    spark.createDataFrame(batch_rows, ["doc_id", "text"]).coalesce(1).write.parquet(src)

    out = str(tmp_path / "kept")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_neardup_gate(stream, corpus, out, str(tmp_path / "ck")).start()
    q.awaitTermination(120)

    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    batch_verdict = {
        r["doc_id"] for r in incremental_neardup(
            spark.read.parquet(src), corpus).collect() if r["keep"] == 1
    }
    assert kept == batch_verdict == {101}


def test_stream_neardup_gate_epoch_replay_is_idempotent(spark, tmp_path):
    """Crash-replay contract (ADVICE r3): a replayed epoch overwrites
    its own partition (dynamic partition overwrite on the epoch
    column) instead of appending a second copy — simulated by wiping
    the streaming checkpoint and re-running the same input, which
    replays epoch 0 onto an output directory that already contains it."""
    from rdf_n3_spark.streaming.dedup import stream_neardup_gate

    corpus = spark.createDataFrame(
        [(1, "unrelated corpus content " * 8)], ["doc_id", "text"])
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(100, " ".join(f"z{i}" for i in range(40)))],
        ["doc_id", "text"]).coalesce(1).write.parquet(src)
    out = str(tmp_path / "kept")

    for attempt in range(2):
        # fresh checkpoint each attempt = the post-crash replay of the
        # same epoch id against a sink that may already hold its rows
        ck = str(tmp_path / f"ck{attempt}")
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = stream_neardup_gate(stream, corpus, out, ck).start()
        q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert [(r.doc_id, r.epoch) for r in rows] == [(100, 0)]


def test_stream_split_leakage_within_and_cross(spark, tmp_path):
    """The continuous leakage audit emits BOTH halves — within-batch
    near-dup pairs straddling splits (== the batch split_leakage on
    the same rows) and batch-vs-corpus leaks via the representative
    verify — while same-split near-dups stay silent.  Split ids are
    pinned from the deterministic md5 assignment: 0/2/3/4/5 → train,
    1/17 → val."""
    from rdf_n3_spark.operators.curation import split_leakage
    from rdf_n3_spark.streaming.dedup import stream_split_leakage

    tpl_a = " ".join(f"a{i}" for i in range(40))
    tpl_b = " ".join(f"b{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(0, tpl_a), (5, "unrelated corpus content " * 8)],
        ["doc_id", "text"])
    batch_rows = [
        (1, tpl_a + " x1"),   # val;   corpus leak vs 0 (train) + batch pair w/ 3
        (3, tpl_a + " x3"),   # train; corpus NEAR-DUP of 0 but SAME split → silent
        (2, tpl_b + " y2"),   # train; within-batch leak w/ 17
        (17, tpl_b + " y17"), # val
        (4, " ".join(f"u{i}" for i in range(40))),  # train; unique
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(batch_rows, ["doc_id", "text"]).coalesce(1).write.parquet(src)

    out = str(tmp_path / "leaks")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_split_leakage(stream, corpus, out, str(tmp_path / "ck")).start()
    q.awaitTermination(120)

    got = {(r.doc_a, r.split_a, r.doc_b, r.split_b)
           for r in spark.read.parquet(out).collect()}
    expected = {
        (0, "train", 1, "val"),    # cross: corpus rep 0 vs incoming 1
        (1, "val", 3, "train"),    # within-batch template-A pair
        (2, "train", 17, "val"),   # within-batch template-B pair
    }
    assert got == expected
    # the within-batch half IS the batch operator run per epoch
    batch_within = {(r.doc_a, r.split_a, r.doc_b, r.split_b)
                    for r in split_leakage(spark.read.parquet(src)).collect()}
    assert batch_within == {(1, "val", 3, "train"), (2, "train", 17, "val")}


def test_stream_conv_dedup_gate(spark, tmp_path):
    """Conversation-grain gate: within-batch copies collapse to the
    smallest conv_id, conversations already in the corpus fingerprint
    snapshot are dropped, unique conversations pass whole (all turns)."""
    from rdf_n3_spark.operators.conversations import conv_dedup
    from rdf_n3_spark.streaming.dedup import stream_conv_dedup

    def conv(cid, texts):
        return [(cid, i, "user" if i % 2 == 0 else "assistant", x, "",
                 ts(i)) for i, x in enumerate(texts)]

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    # corpus already holds the fingerprint of ("hi", "hello")
    seen = spark.createDataFrame(conv("old", ["hi", "hello"]), schema)
    corpus_fps = conv_dedup(seen).select("fp")

    batch = (conv("n1", ["hi", "hello"])        # dup of corpus → drop
             + conv("n2", ["fresh", "dialog"])  # unique → keep
             + conv("n3", ["fresh", "dialog"])  # in-batch copy → drop
             + conv("n4", ["another", "one"]))  # unique → keep
    src = str(tmp_path / "turns")
    spark.createDataFrame(batch, schema).coalesce(1).write.parquet(src)

    out = str(tmp_path / "kept")
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_conv_dedup(stream, corpus_fps, out,
                          str(tmp_path / "ck")).start()
    q.awaitTermination(120)

    kept = spark.read.parquet(out)
    assert {r["conv_id"] for r in kept.select("conv_id").collect()} \
        == {"n2", "n4"}
    # survivors pass WHOLE: both turns of each kept conversation
    assert kept.count() == 4
