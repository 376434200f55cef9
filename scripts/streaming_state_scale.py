#!/usr/bin/env python3
"""Streaming sessionizer state-scale rehearsal (round-5 task 6).

The multibatch oracle proves SEMANTICS; this measures state BEHAVIOR at
width: many users x open tails across many micro-batches. Construction
(deterministic, no RNG):

- N_EVENTS events over N_USERS distinct users in N_SLOTS time windows
  (one parquet file per window, replayed oldest-first, one per trigger);
- user u is active in windows {u % ROT, u % ROT + ROT} (ROT = N_SLOTS/2)
  — so each window sees ~N_USERS/ROT distinct users, each user forms two
  gap-separated sessions, and the watermark (one window's span) retires
  a window's tails shortly after it passes;
- per micro-batch we record the state store's numRowsTotal, batch
  duration, and state memory from StreamingQueryProgress.

The O(users)-not-O(events) claim, made falsifiable two ways:
1. max(numRowsTotal) <= live-tail bound (users whose sessions can still
   change; << N_USERS, INDEPENDENT of N_EVENTS);
2. rerun with N_EVENTS doubled at fixed N_USERS: the state-row curve is
   unchanged (events pass through; only open tails persist).

Usage: [N_USERS] [N_EVENTS] [N_SLOTS]; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_USERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
N_SLOTS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
GAP = 300.0
SLOT_SPAN = 3600  # seconds per window; >> GAP so windows are sessions
BASE_TS = 1_700_000_000


def run_state_scale(spark, n_users: int, n_events: int,
                    n_slots: int = 16, gap: float = GAP,
                    slot_span: int = SLOT_SPAN) -> dict:
    """Generate the rotating-window stream, drain it one file per
    trigger, and report per-batch state rows / durations / memory plus
    the O(users) summary. Reusable from bench.py (scaled-down extra)."""
    from pyspark.sql import functions as F

    from parquet_playground_rs_spark.streaming.sessions import (
        sessionize_stream,
    )

    rot = n_slots // 2
    per_slot = n_events // n_slots
    in_dir = tempfile.mkdtemp(prefix="spark_graft_state_scale_in_")
    out_dir = tempfile.mkdtemp(prefix="spark_graft_state_scale_out_")
    t_gen = time.time()
    base_mtime = int(os.stat(in_dir).st_mtime)
    for s in range(n_slots):
        # users active this window: u % rot == s % rot; their k-th event
        # sits k*17 s into the window (17 << GAP keeps one session)
        df = (spark.range(per_slot)
              .select(
                  (F.col("id") + s * per_slot).alias("event_id"),
                  ((F.col("id") % (n_users // rot)) * rot
                   + (s % rot)).alias("user_id"),
                  F.lit("evt").alias("event_type"),
                  F.to_timestamp(F.lit(BASE_TS) + s * slot_span
                                 + F.floor(F.col("id") / (n_users // rot)) * 17)
                  .alias("ts"),
                  (F.col("id") % 97).cast("double").alias("value"),
                  F.lit("{}").alias("props"),
              ))
        tmp = tempfile.mkdtemp(prefix="spark_graft_state_scale_tmp_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(p for p in sorted(os.listdir(tmp))
                   if p.endswith(".parquet"))
        dst = os.path.join(in_dir, f"w{s:03d}.parquet")
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (base_mtime + s * 10, base_mtime + s * 10))
    gen_sec = time.time() - t_gen

    t0 = time.time()
    q = sessionize_stream(spark, in_dir, out_dir, gap_sec=gap,
                          watermark=f"{slot_span} seconds",
                          max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    wall = time.time() - t0

    batches = []
    for p in progress:
        so = (p.get("stateOperators") or [{}])[0]
        batches.append({
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "state_rows": so.get("numRowsTotal"),
            "state_mem_bytes": so.get("memoryUsedBytes"),
            "batch_sec": round((p.get("batchDuration") or 0) / 1000, 2),
        })
    n_sessions = spark.read.parquet(f"{out_dir}/data").count()
    max_state = max((b["state_rows"] or 0) for b in batches)
    out = {
        "n_users": n_users, "n_events": n_events, "n_slots": n_slots,
        "gen_sec": round(gen_sec, 1), "stream_wall_sec": round(wall, 1),
        "events_per_sec": round(n_events / wall, 0),
        "closed_sessions": int(n_sessions),
        "max_state_rows": int(max_state),
        "state_rows_over_users": round(max_state / n_users, 3),
        "state_rows_over_events": round(max_state / n_events, 4),
        "batches": batches,
    }
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    return out


def main() -> None:
    allowed = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, set(allowed[:min(CPUS, len(allowed))]))

    from parquet_playground_rs_spark.session import get_spark

    spark = get_spark(app="stream-state-scale", cores=CPUS,
                      shuffle_partitions=CPUS, driver_mem="12g")
    out = run_state_scale(spark, N_USERS, N_EVENTS, N_SLOTS)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
