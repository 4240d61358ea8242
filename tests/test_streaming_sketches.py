"""Continuous sketch rollups: multi-epoch streamed sketches fold to
EXACTLY the batch sketch of the full history, and replayed epochs
don't double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.sketch import cms_lookup, cms_sketch, kmv_distinct
from rdf_n3_spark.streaming.sketches import (
    read_cms_rollup,
    read_kmv_rollup,
    stream_cms_rollup,
    stream_kmv_rollup,
)


def _write_shards(spark, tmp_path, name):
    """Two parquet files → with maxFilesPerTrigger=1, two epochs."""
    src = str(tmp_path / name)
    rows_a = [("g", f"x{i}") for i in range(120)] + [("h", "only")]
    rows_b = [("g", f"x{i}") for i in range(80, 260)]  # overlaps shard A
    spark.createDataFrame(rows_a, ["key", "val"]).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(rows_b, ["key", "val"]).coalesce(1).write.mode(
        "append").parquet(src)
    return src


def _kmv_rows(df):
    return {r["key"]: (r["n_seen"], r["kth_hash"], r["est_distinct"])
            for r in df.collect()}


def test_kmv_rollup_equals_batch(spark, tmp_path):
    src = _write_shards(spark, tmp_path, "in_kmv")
    out, ck = str(tmp_path / "sk"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("key string, val string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_kmv_rollup(stream, out, ck, "key", "val", k=32).start()
    q.awaitTermination(120)

    epochs = {r["epoch"] for r in spark.read.parquet(out).collect()}
    assert len(epochs) == 2, epochs  # the fold is genuinely multi-epoch
    got = _kmv_rows(read_kmv_rollup(spark, out, "key", k=32))
    want = _kmv_rows(
        kmv_distinct(spark.read.parquet(src), "key", F.col("val"), k=32))
    assert got == want


def test_cms_rollup_equals_batch_and_replay_is_idempotent(spark, tmp_path):
    src = _write_shards(spark, tmp_path, "in_cms")
    out = str(tmp_path / "cells")

    def run(ck):
        stream = (
            spark.readStream.schema("key string, val string")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_cms_rollup(stream, out, ck, "val",
                              depth=2, width=256).start()
        q.awaitTermination(120)

    run(str(tmp_path / "ck0"))
    # fresh checkpoint = post-crash replay of the SAME epochs onto a
    # sink that already holds them; counters must NOT double
    run(str(tmp_path / "ck1"))

    full = spark.read.parquet(src)
    probes = full.select("val").distinct()
    got = {
        r["v"]: r["est_count"]
        for r in read_cms_rollup(spark, out, probes, F.col("val"),
                                 depth=2, width=256).collect()
    }
    want = {
        r["v"]: r["est_count"]
        for r in cms_lookup(
            cms_sketch(full, F.col("val"), depth=2, width=256),
            probes, F.col("val"), depth=2, width=256).collect()
    }
    assert got == want
    # sanity: the dominant value count survives the fold exactly
    exact = full.where(F.col("val") == "x100").count()
    assert got["x100"] >= exact


def test_bloom_rollup_equals_batch(spark, tmp_path):
    """Multi-epoch streamed Bloom filters bit_or-fold to EXACTLY the
    batch filter of the full history, and the folded probe agrees with
    the batch probe on present AND absent values."""
    from rdf_n3_spark.operators.sketch import bloom_probe, bloom_sketch
    from rdf_n3_spark.streaming.sketches import (
        read_bloom_rollup,
        stream_bloom_rollup,
    )

    src = _write_shards(spark, tmp_path, "in_bloom")
    out, ck = str(tmp_path / "bf"), str(tmp_path / "bck")
    stream = (
        spark.readStream.schema("key string, val string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_bloom_rollup(stream.select("val"), out, ck, "val").start()
    q.awaitTermination(120)

    epochs = {r["epoch"] for r in spark.read.parquet(out).collect()}
    assert len(epochs) == 2, epochs
    hist = spark.read.parquet(src)
    probes = hist.select("val").unionByName(
        spark.createDataFrame([("absent1",), ("absent2",)], ["val"]))
    got = {r["v"]: r["maybe_present"]
           for r in read_bloom_rollup(spark, out, probes, F.col("val")).collect()}
    want = {r["v"]: r["maybe_present"]
            for r in bloom_probe(bloom_sketch(hist, F.col("val")),
                                 probes, F.col("val")).collect()}
    assert got == want
    assert all(got[r["val"]] == 1 for r in hist.collect())
    # folded filter table == whole-history filter table, row for row
    from rdf_n3_spark.operators.sketch import bloom_merge_all

    folded = {(r["word"], r["bits"])
              for r in bloom_merge_all(spark.read.parquet(out)).collect()}
    whole = {(r["word"], r["bits"])
             for r in bloom_sketch(hist, F.col("val")).collect()}
    assert folded == whole


def test_conversation_rollup_equals_batch_across_epoch_split(spark, tmp_path):
    """A conversation whose turns SPAN the two epochs folds to exactly
    the batch conversation_stats row, and replayed epochs don't
    double-count."""
    import datetime

    from rdf_n3_spark.operators.conversations import conversation_stats
    from rdf_n3_spark.streaming.sketches import (
        read_conversation_rollup,
        stream_conversation_rollup,
    )

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    def turn(c, i, r, x, tool, s):
        return (c, i, r, x, tool,
                datetime.datetime(2026, 1, 1)
                + datetime.timedelta(seconds=s))

    src = str(tmp_path / "turns")
    # epoch A: conv c1 turns 0-1, conv c2 turn 0
    spark.createDataFrame([
        turn("c1", 0, "user", "hello world", "", 0),
        turn("c1", 1, "assistant", "hi", "", 5),
        turn("c2", 0, "user", "solo", "", 50),
    ], schema).coalesce(1).write.mode("append").parquet(src)
    # epoch B: conv c1 continues — the cross-epoch fold case
    spark.createDataFrame([
        turn("c1", 2, "tool", "result rows", "lookup", 9),
    ], schema).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "convs")

    def run(ck):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = stream_conversation_rollup(stream, out, ck).start()
        q.awaitTermination(120)

    run(str(tmp_path / "ck0"))
    epochs = {r["epoch"] for r in spark.read.parquet(out).collect()}
    assert len(epochs) == 2, epochs

    def rows(df):
        return sorted(
            (r["conv_id"], r["n_turns"], r["n_user"], r["n_tool_calls"],
             r["n_tokens"], r["n_chars"], r["duration_seconds"])
            for r in df.collect())

    want = rows(conversation_stats(spark.read.parquet(src)))
    assert rows(read_conversation_rollup(spark, out)) == want
    # crash-replay with a fresh checkpoint: same epochs overwrite
    # themselves, the fold must not double
    run(str(tmp_path / "ck1"))
    assert rows(read_conversation_rollup(spark, out)) == want


def test_transition_rollup_equals_batch_across_epoch_split(spark, tmp_path):
    """A hand-off pair whose two turns land in DIFFERENT epochs folds
    to exactly the batch turn_transitions matrix — the non-additive
    rollup: within-epoch pairs are partials, cross-epoch pairs are
    completed from open boundary turns at read time."""
    import datetime

    from rdf_n3_spark.operators.conversations import turn_transitions
    from rdf_n3_spark.streaming.sketches import (
        read_transition_rollup,
        stream_transition_rollup,
    )

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    def turn(c, i, r, s):
        return (c, i, r, "x", "",
                datetime.datetime(2026, 1, 1)
                + datetime.timedelta(seconds=s))

    src = str(tmp_path / "turns")
    # epoch A: c1 turns 0-1 (one within-epoch pair), c2 turn 1 ONLY
    # (backward-open with no partner yet), c3 turn 0 (solo forever)
    spark.createDataFrame([
        turn("c1", 0, "user", 0),
        turn("c1", 1, "assistant", 5),
        turn("c2", 1, "assistant", 107),
        turn("c3", 0, "user", 50),
    ], schema).coalesce(1).write.mode("append").parquet(src)
    # epoch B: c1 turn 2 (cross-epoch pair with c1 turn 1), c2 turn 0
    # (cross-epoch pair ARRIVING OUT OF ORDER — the earlier turn in
    # the later epoch)
    spark.createDataFrame([
        turn("c1", 2, "tool", 9),
        turn("c2", 0, "user", 100),
    ], schema).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "trans")

    def run(ck):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = stream_transition_rollup(stream, out, ck).start()
        q.awaitTermination(120)

    run(str(tmp_path / "ck0"))
    epochs = {r["epoch"] for r in spark.read.parquet(out).collect()}
    assert len(epochs) == 2, epochs

    def rows(df):
        return sorted(
            (r["role_from"], r["role_to"], r["n"], r["n_convs"],
             r["total_gap_seconds"], r["max_gap_seconds"])
            for r in df.collect())

    batch = spark.createDataFrame([
        turn("c1", 0, "user", 0), turn("c1", 1, "assistant", 5),
        turn("c1", 2, "tool", 9),
        turn("c2", 0, "user", 100), turn("c2", 1, "assistant", 107),
        turn("c3", 0, "user", 50),
    ], schema)
    want = rows(turn_transitions(batch))
    got = rows(read_transition_rollup(spark, out))
    assert got == want, (got, want)
    # the user→assistant cell must show BOTH conversations (n_convs
    # exactness across epochs) and the cross-epoch 7s gap as its max
    ua = [r for r in got if r[0] == "user" and r[1] == "assistant"][0]
    assert ua[2] == 2 and ua[3] == 2 and ua[5] == 7

    # replay the stream with a FRESH checkpoint: epochs overwrite
    # their own partitions, the fold must not double-count
    run(str(tmp_path / "ck1"))
    assert rows(read_transition_rollup(spark, out)) == want


def test_transition_fold_equals_batch_on_random_splits(spark):
    """Property over seeded random epoch splits: for ANY partition of
    the turn history into epochs, fold(partials per epoch) == batch
    turn_transitions.  Exercises splits the hand-built case can't:
    many conversations, interleaved epochs, gaps landing anywhere."""
    import datetime
    import random

    from rdf_n3_spark.operators.conversations import (
        transition_partials,
        turn_transitions,
    )
    from rdf_n3_spark.streaming.sketches import fold_transition_partials
    from pyspark.sql import functions as F

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    roles = ["user", "assistant", "tool"]

    def rows_of(df):
        return sorted(
            (r["role_from"], r["role_to"], r["n"], r["n_convs"],
             r["total_gap_seconds"], r["max_gap_seconds"])
            for r in df.collect())

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        turns = []
        for c in range(6):
            n = rng.randint(1, 9)
            s = rng.randint(0, 1000)
            for i in range(n):
                s += rng.randint(0, 60)
                turns.append((f"c{c}", i, rng.choice(roles), "x", "",
                              datetime.datetime(2026, 1, 1)
                              + datetime.timedelta(seconds=s)))
        full = spark.createDataFrame(turns, schema)
        want = rows_of(turn_transitions(full))

        n_epochs = rng.randint(2, 4)
        assign = [rng.randrange(n_epochs) for _ in turns]
        parts = []
        for ep in range(n_epochs):
            sub = [t for t, a in zip(turns, assign) if a == ep]
            if not sub:
                continue
            parts.append(
                transition_partials(spark.createDataFrame(sub, schema))
                .withColumn("epoch", F.lit(ep)))
        state = parts[0]
        for p in parts[1:]:
            state = state.unionByName(p)
        got = rows_of(fold_transition_partials(state))
        assert got == want, (seed, got, want)
