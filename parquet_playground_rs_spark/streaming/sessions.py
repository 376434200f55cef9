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

Round 8 (round-7 judge task 5): `sessionize_stream_bucketed` below is
the ADOPTED throughput path — same output contract, state keyed by
hash buckets of users instead of users, measured 2.7-3.6x faster at
100k users / 800k events with the closed-session set and watermark-
drop accounting IDENTICAL on all three disorder-replay orders
(BENCH/streaming_bucketed_ab.json; adoption bar was >=2x at equal
correctness). The per-user operator stays as the semantics reference
and cross-round bench canary.
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


# ---------------------------------------------------------------------------
# Round 8 (round-7 judge task 5): bucketed-state sessionizer experiment.
#
# The per-user operator's throughput is bounded by applyInPandasWithState's
# per-GROUP pandas dispatch (~6-16k events/s at width, BENCH/CEILING.md):
# every user with data in a micro-batch costs one python UDF invocation
# over a tiny frame. This variant coarsens the STATE KEY to
# pmod(xxhash64(user_id), n_buckets): one state row per bucket holds the
# open tails of ALL its users as parallel arrays, so a micro-batch costs
# n_buckets dispatches instead of n_active_users, and the per-user gap
# walk runs as grouped pandas/numpy over the whole bucket at once.
#
# Semantics are the per-user operator's, re-derived per bucket:
# - same gap rule, same late-beyond-tail-start discard, same
#   running-max guard for out-of-order events within the tolerance;
# - timeout: the bucket's event-time timer is armed at the EARLIEST
#   open-tail deadline (min last_ts + gap); when it fires, every tail
#   whose deadline the watermark passed closes (exactly the tails whose
#   per-user timers would have fired by now). Because Spark suppresses
#   a group's timeout in a batch where it received data, a data batch
#   ALSO closes its bucket's expired tails inline (the per-user
#   operator's timer would have fired for those users in this batch —
#   they just share a state key with an active user here).
# ---------------------------------------------------------------------------

BUCKET_STATE_DDL = ("user_ids array<bigint>, starts array<double>, "
                    "last_ts array<double>, n_events array<bigint>, "
                    "value_sums array<double>")
_SESSION_COLS = ["user_id", "session_start", "session_end", "n_events",
                 "value_sum"]


def _tails_frame(uids, starts, lasts, ns, sums, mask):
    import numpy as np  # noqa: F401

    return pd.DataFrame({
        "user_id": uids[mask], "session_start": starts[mask],
        "session_end": lasts[mask], "n_events": ns[mask],
        "value_sum": sums[mask]})[_SESSION_COLS]


def _rearm_bucket(state, lasts, gap_sec) -> None:
    """Bucket timer at the EARLIEST tail deadline, clamped above the
    watermark (same clamp rule as the per-user _rearm)."""
    desired = int((float(lasts.min()) + gap_sec) * 1000)
    try:
        wm = state.getCurrentWatermarkMs()
    except Exception:
        wm = 0
    state.setTimeoutTimestamp(max(desired, wm + 1))


def _sessionize_bucket_group(key: tuple, pdf_iter: Iterator[pd.DataFrame],
                             state: Any,
                             gap_sec: float) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.exists:
        g = state.get
        uids0 = np.asarray(g[0], dtype=np.int64)
        starts0 = np.asarray(g[1], dtype=np.float64)
        lasts0 = np.asarray(g[2], dtype=np.float64)
        ns0 = np.asarray(g[3], dtype=np.int64)
        sums0 = np.asarray(g[4], dtype=np.float64)
    else:
        uids0 = np.empty(0, dtype=np.int64)
        starts0 = lasts0 = sums0 = np.empty(0, dtype=np.float64)
        ns0 = np.empty(0, dtype=np.int64)
    try:
        wm = state.getCurrentWatermarkMs() / 1000.0
    except Exception:
        wm = 0.0

    def save(keep_mask):
        if keep_mask.any():
            state.update((uids0[keep_mask].tolist(),
                          starts0[keep_mask].tolist(),
                          lasts0[keep_mask].tolist(),
                          ns0[keep_mask].tolist(),
                          sums0[keep_mask].tolist()))
            _rearm_bucket(state, lasts0[keep_mask], gap_sec)
        elif state.exists:
            state.remove()

    if state.hasTimedOut:
        # STRICT comparison (round-9 ADVICE): the per-user operator
        # continues a session at ts - last == gap and Spark timers fire
        # only when the watermark strictly passes the deadline, so a
        # tail expires only when last + gap < wm — <= would split, at
        # the exact boundary, a session the per-user reference keeps.
        expired = (lasts0 + gap_sec) < wm
        save(~expired)
        if expired.any():
            yield _tails_frame(uids0, starts0, lasts0, ns0, sums0,
                               expired)
        return

    frames = []
    # inline close of expired tails (see module comment: their per-user
    # timers would fire this batch, but data on this bucket suppresses
    # the bucket timer); STRICT < matches the per-user timer rule (see
    # the timed-out branch above)
    expired = (lasts0 + gap_sec) < wm
    if expired.any():
        frames.append(_tails_frame(uids0, starts0, lasts0, ns0, sums0,
                                   expired))
        live = ~expired
        uids0, starts0, lasts0 = uids0[live], starts0[live], lasts0[live]
        ns0, sums0 = ns0[live], sums0[live]

    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    d = pd.DataFrame({
        "uid": pdf["user_id"].to_numpy(dtype=np.int64),
        "ts": pdf["ts"].astype("int64").to_numpy() / 1e9,
        "val": pdf["value"].to_numpy(dtype=np.float64)})
    d.sort_values(["uid", "ts"], kind="stable", inplace=True,
                  ignore_index=True)
    tails = pd.DataFrame({"uid": uids0, "t_start": starts0,
                          "t_last": lasts0, "t_n": ns0, "t_sum": sums0})
    d = d.merge(tails, on="uid", how="left")
    # events older than a tail's start belong to sessions already
    # emitted — discarded, same policy as the per-user operator
    t_start = d["t_start"].to_numpy()
    keep = np.isnan(t_start) | (d["ts"].to_numpy() >= t_start)
    if not keep.all():
        d = d[keep].reset_index(drop=True)

    batch_uids = d["uid"].to_numpy() if len(d) else np.empty(0, np.int64)
    if len(d) == 0:
        # purely-late batch: every event predated its tail — nothing
        # changes, keep all tails armed
        save(np.ones(len(uids0), dtype=bool))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        return

    ts = d["ts"].to_numpy()
    t_last = d["t_last"].to_numpy()  # NaN for tailless users
    grp = d.groupby("uid", sort=False)
    cm = grp["ts"].cummax().to_numpy()
    prev = np.empty_like(cm)
    prev[1:] = cm[:-1]
    first = np.empty(len(d), dtype=bool)
    first[0] = True
    first[1:] = batch_uids[1:] != batch_uids[:-1]
    prev[first] = -np.inf
    # running max over [tail_last, ts_0 .. ts_{i-1}] — the per-user
    # operator's run_max guard, vectorized across the bucket
    eff_prev = np.where(np.isnan(t_last), prev, np.maximum(prev, t_last))
    new_sess = (ts - eff_prev) > gap_sec
    new_sess[first & np.isnan(t_last)] = False
    d["sess"] = pd.Series(new_sess.astype(np.int64)).groupby(
        pd.Series(batch_uids), sort=False).cumsum().to_numpy()

    agg = (d.groupby(["uid", "sess"], sort=False)
           .agg(n=("ts", "size"), s=("val", "sum"), st=("ts", "min"),
                en=("ts", "max")).reset_index())
    # fold the stored tail into its continuation (sess 0)
    agg = agg.merge(tails, on="uid", how="left")
    cont = (agg["sess"] == 0) & agg["t_start"].notna()
    agg.loc[cont, "st"] = agg.loc[cont, "t_start"]
    agg.loc[cont, "n"] += agg.loc[cont, "t_n"].astype(np.int64)
    agg.loc[cont, "s"] += agg.loc[cont, "t_sum"]
    agg.loc[cont, "en"] = np.maximum(agg.loc[cont, "en"],
                                     agg.loc[cont, "t_last"])
    # tails whose batch opened at sess 1 closed ALONE (first gap > gap)
    min_sess = agg.groupby("uid", sort=False)["sess"].transform("min")
    alone = tails[tails["uid"].isin(
        agg.loc[min_sess == 1, "uid"].unique())]
    if len(alone):
        frames.append(pd.DataFrame({
            "user_id": alone["uid"], "session_start": alone["t_start"],
            "session_end": alone["t_last"], "n_events": alone["t_n"],
            "value_sum": alone["t_sum"]})[_SESSION_COLS])
    # last session per user stays open; earlier ones close now
    max_sess = agg.groupby("uid", sort=False)["sess"].transform("max")
    closed = agg[agg["sess"] < max_sess]
    if len(closed):
        frames.append(pd.DataFrame({
            "user_id": closed["uid"], "session_start": closed["st"],
            "session_end": closed["en"],
            "n_events": closed["n"].astype(np.int64),
            "value_sum": closed["s"]})[_SESSION_COLS])
    opens = agg[agg["sess"] == max_sess]

    # new state: untouched tails + the open tail of every batch user
    touched = np.isin(uids0, opens["uid"].to_numpy())
    uids0 = np.concatenate([uids0[~touched],
                            opens["uid"].to_numpy(dtype=np.int64)])
    starts0 = np.concatenate([starts0[~touched],
                              opens["st"].to_numpy(dtype=np.float64)])
    lasts0 = np.concatenate([lasts0[~touched],
                             opens["en"].to_numpy(dtype=np.float64)])
    ns0 = np.concatenate([ns0[~touched],
                          opens["n"].to_numpy(dtype=np.int64)])
    sums0 = np.concatenate([sums0[~touched],
                            opens["s"].to_numpy(dtype=np.float64)])
    save(np.ones(len(uids0), dtype=bool))
    if frames:
        yield pd.concat(frames, ignore_index=True)


def sessionize_stream_bucketed(spark, input_dir: str, out_dir: str,
                               gap_sec: float = 300.0,
                               n_buckets: int = 256,
                               checkpoint_dir: str | None = None,
                               watermark: str = "10 minutes",
                               max_files_per_trigger: int = 8):
    """The bucketed-state sessionizer (experiment, task 5): identical
    output contract to `sessionize_stream`, state keyed by
    pmod(xxhash64(user_id), n_buckets) with per-bucket tail arrays.
    State remains O(open users) in BYTES; rows drop to O(n_buckets)."""
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
        .withColumn("bucket",
                    F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))
    )

    def fn(key, pdfs, state):
        return _sessionize_bucket_group(key, pdfs, state, gap_sec)

    out = src.groupBy("bucket").applyInPandasWithState(
        fn, SESSION_DDL, BUCKET_STATE_DDL, "append",
        GroupStateTimeout.EventTimeTimeout)
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
