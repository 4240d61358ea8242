"""Custom stateful streaming operator: gap-based sessionization.

The reference engine is batch-only (SURVEY §2.10); this is the
scale-path stateful-operator surface the target pipeline needs:
``applyInPandasWithState`` keeps one state row per key (Arrow-batched,
no per-row Python), closing a session whenever the gap between
consecutive events exceeds ``gap_s`` and on processing-time timeout
for keys that go quiet.

Shape notes for 10^12 events: state is O(active keys), not O(events);
the group shuffle is the same conv/user partitioning the rest of the
pipeline uses; timeouts bound state growth the same way the watermark
bounds the windowed aggregate in streaming/ingest.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, "
    "n_events int, closed_by string"
)
STATE_SCHEMA = "start long, last long, n int"

GAP_S_DEFAULT = 1800


def _sessions_from_epochs(epochs: list[int], gap_s: int):
    """Split a sorted epoch list into (start, end, n) sessions."""
    out = []
    start = last = epochs[0]
    n = 1
    for e in epochs[1:]:
        if e - last > gap_s:
            out.append((start, last, n))
            start, n = e, 0
        n += 1
        last = e
    return out, (start, last, n)


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_s: int = GAP_S_DEFAULT) -> DataFrame:
    """Streaming (grouped-state) sessionization: one output row per
    closed session. Open sessions persist in state; a key silent for
    ``gap_s`` (processing time) times out and flushes."""

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        k = str(key_tuple[0])
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "key": [k],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                })
            return

        epochs: list[int] = []
        if state.exists:
            start, last, n = state.get
            # re-expand the open session boundary events; counts merge below
            prev = (start, last, n)
        else:
            prev = None
        for pdf in pdfs:
            epochs.extend(int(v.timestamp()) for v in pd.to_datetime(pdf[ts]))
        epochs.sort()
        rows = {c: [] for c in ("key", "session_start", "session_end", "n_events", "closed_by")}
        if prev is not None:
            start, last, n = prev
            if epochs and epochs[0] - last <= gap_s:
                # batch continues the open session: seed it
                closed, (cs, cl, cn) = _sessions_from_epochs(epochs, gap_s)
                # first closed-or-open chunk merges with the carried state
                if closed:
                    first = closed[0]
                    merged = (start, first[1], n + first[2])
                    closed = [merged] + closed[1:]
                    opened = (cs, cl, cn)
                else:
                    opened = (start, cl, n + cn)
            else:
                # gap (or empty batch) closes the carried session
                rows["key"].append(k)
                rows["session_start"].append(pd.Timestamp(start, unit="s"))
                rows["session_end"].append(pd.Timestamp(last, unit="s"))
                rows["n_events"].append(n)
                rows["closed_by"].append("gap")
                closed, opened = (_sessions_from_epochs(epochs, gap_s)
                                  if epochs else ([], None))
        else:
            closed, opened = (_sessions_from_epochs(epochs, gap_s)
                              if epochs else ([], None))
        for (s0, s1, sn) in closed:
            rows["key"].append(k)
            rows["session_start"].append(pd.Timestamp(s0, unit="s"))
            rows["session_end"].append(pd.Timestamp(s1, unit="s"))
            rows["n_events"].append(sn)
            rows["closed_by"].append("gap")
        if opened is not None:
            state.update(opened)
            state.setTimeoutDuration(gap_s * 1000)
        yield pd.DataFrame(rows)

    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
