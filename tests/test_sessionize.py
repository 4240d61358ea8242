"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest

from rdf_n3_spark.streaming.sessionize import _sessions_from_epochs, sessionize


def ts(m):  # minutes → epoch seconds from a fixed origin
    return 1700000000 + m * 60


def test_session_splitter_pure():
    closed, open_ = _sessions_from_epochs(
        [ts(0), ts(1), ts(2), ts(90), ts(95)], gap_s=1800
    )
    assert closed == [(ts(0), ts(2), 3)]
    assert open_ == (ts(90), ts(95), 2)


def test_session_splitter_single():
    closed, open_ = _sessions_from_epochs([ts(0)], gap_s=1800)
    assert closed == [] and open_ == (ts(0), ts(0), 1)


@pytest.fixture()
def event_drop(spark, tmp_path):
    rows = [
        # user a: two sessions (gap 2h), second stays open
        ("a", ts(0)), ("a", ts(10)), ("a", ts(20)),
        ("a", ts(140)), ("a", ts(150)),
        # user b: one open session
        ("b", ts(5)),
    ]
    pdf = pd.DataFrame(
        {"user_id": [r[0] for r in rows],
         "ts": [datetime.fromtimestamp(r[1], tz=timezone.utc) for r in rows]}
    )
    df = spark.createDataFrame(pdf)
    src = str(tmp_path / "events")
    df.coalesce(1).write.parquet(src)
    return src


def test_sessionize_stream(spark, event_drop, tmp_path):
    stream = (
        spark.readStream.schema("user_id string, ts timestamp").parquet(event_drop)
    )
    out = sessionize(stream, key="user_id", ts="ts", gap_s=1800)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # processing-time timeouts keep the engine cycling micro-batches
    # while quiet keys wait to expire, so drain by polling the sink
    # and stop explicitly
    import time

    for _ in range(120):
        if spark.table("sessions").count() > 0:
            break
        time.sleep(0.5)
    q.stop()
    got = {
        (r["key"], int(r["session_start"].timestamp()),
         int(r["session_end"].timestamp()), r["n_events"], r["closed_by"])
        for r in spark.table("sessions").collect()
    }
    # only user a's FIRST session closed inside the batch (gap split);
    # the open sessions (a's second, b's only) remain in state
    assert got == {("a", ts(0), ts(20), 3, "gap")}
