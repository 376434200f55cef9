"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState``.

The batch engine already sessionizes with a window (events_sessions
query); streams can't — a session closes only when ENOUGH SILENCE has
passed, which needs per-key state across micro-batches. This is the
engine's custom-stateful surface (SURVEY §2.7): per-user open-session
state in the state store, closed sessions emitted in append mode,
event-time timeout + watermark flushing idle users.

Semantics (same as the batch query's gap rule): events of one user
belong to one session while consecutive gaps are <= gap_sec; a longer
gap closes the session. Within each micro-batch the gap walk is
vectorized pandas (diff/cumsum — no per-row Python); state holds only
the open tail (start, last_ts, n_events, value_sum) — O(1) per user, the
only thing that must survive between batches at 100 TB/day rates.

Emission: sessions closed by a visible gap emit immediately; the open
tail emits when the event-time timeout fires (watermark passes
last_ts + gap). Final tails of a finite test stream stay open — tests
account for that.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

EVENTS_DDL = ("event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double, props string")
SESSION_DDL = ("user_id bigint, session_start double, session_end double, "
               "n_events bigint, value_sum double")
STATE_DDL = "start double, last_ts double, n_events bigint, value_sum double"


def _sessionize_group(key: tuple, pdf_iter: Iterator[pd.DataFrame],
                      state: Any, gap_sec: float) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cols = ["user_id", "session_start", "session_end", "n_events", "value_sum"]

    if state.hasTimedOut:
        start, last_ts, n_events, value_sum = state.get
        state.remove()
        yield pd.DataFrame([[user_id, start, last_ts, int(n_events),
                             value_sum]], columns=cols)
        return

    import numpy as np

    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    ts = pdf["ts"].astype("int64").to_numpy() / 1e9  # epoch seconds
    order = ts.argsort(kind="stable")
    ts = ts[order]
    vals = pdf["value"].to_numpy()[order]

    closed = []
    if state.exists:
        start0, last0, n0, sum0 = state.get
        # events older than the open tail's START belong to sessions that
        # already closed and emitted — merging them is impossible, so they
        # are discarded (the standard late-beyond-state policy; watermark
        # keeps this window bounded)
        keep = ts >= start0
        ts, vals = ts[keep], vals[keep]
        if ts.size == 0:
            _rearm(state, last0, gap_sec)
            return
        if (ts[0] - last0) > gap_sec:
            # The stored tail's session ended before this batch arrived
            # (the timeout just hasn't fired yet — watermark may lag the
            # gap). Close it at ITS OWN last event, never at a batch
            # timestamp, and start this batch fresh.
            closed.append([user_id, start0, float(last0), int(n0),
                           float(sum0)])
            state.remove()
            start0, last0, n0, sum0 = ts[0], None, 0, 0.0
    else:
        start0, last0, n0, sum0 = ts[0], None, 0, 0.0

    # session boundaries: position i starts a new session when the gap
    # from the LATEST time seen so far exceeds gap_sec. The running max
    # matters for late (out-of-order across micro-batches) events: with a
    # stored tail at last0=1100 and a batch [950, 1300], the 1300 event is
    # 200s after 1100 and must NOT open a new session just because the
    # late 950 sat between them.
    prev = np.concatenate(([last0 if last0 is not None else ts[0]], ts[:-1]))
    run_max = np.maximum.accumulate(
        np.maximum(prev, last0 if last0 is not None else prev[0]))
    new_sess = (ts - run_max) > gap_sec
    sess_id = np.cumsum(new_sess)  # 0 = continues the open tail
    for sid in range(int(sess_id.max()) + 1):
        m = sess_id == sid
        seg_ts = ts[m]
        if seg_ts.size == 0:
            continue  # defensive: can only be sid 0, already closed above
        seg_sum = float(vals[m].sum())
        seg_n = int(m.sum())
        seg_end = float(seg_ts[-1])
        if sid == 0:
            seg_start = start0
            seg_n += int(n0)
            seg_sum += float(sum0)
            if last0 is not None:
                # a purely-late batch must never move the session end (or
                # the timeout) backwards
                seg_end = max(seg_end, float(last0))
        else:
            seg_start = float(seg_ts[0])
        if sid < sess_id.max():
            closed.append([user_id, seg_start, seg_end, seg_n, seg_sum])
        else:
            state.update((float(seg_start), seg_end, int(seg_n),
                          float(seg_sum)))
            _rearm(state, seg_end, gap_sec)
    if closed:
        yield pd.DataFrame(closed, columns=cols)


def _rearm(state: Any, last_ts: float, gap_sec: float) -> None:
    """Set the event-time timeout at last_ts + gap, clamped ABOVE the
    current watermark: Spark throws (killing the query) on a timeout at or
    below the watermark, which a late straggler batch can otherwise
    produce."""
    desired = int((last_ts + gap_sec) * 1000)
    try:
        wm = state.getCurrentWatermarkMs()
    except Exception:
        wm = 0
    state.setTimeoutTimestamp(max(desired, wm + 1))


def sessionize_stream(spark, input_dir: str, out_dir: str,
                      gap_sec: float = 300.0,
                      checkpoint_dir: str | None = None,
                      watermark: str = "10 minutes",
                      max_files_per_trigger: int = 8):
    """Start the streaming sessionizer; returns the StreamingQuery.

    Output parquet rows: closed sessions (user_id, session_start/end as
    epoch seconds, n_events, value_sum).
    """
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    checkpoint = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    src = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_sec)

    out = src.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_DDL, STATE_DDL, "append",
        GroupStateTimeout.EventTimeTimeout)
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
