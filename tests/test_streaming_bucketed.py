"""Bucketed-state sessionizer (round 8, round-7 judge task 5): the
per-user operator's output contract, re-keyed to hash buckets of users
so a micro-batch costs O(n_buckets) pandas dispatches instead of
O(active users). These tests pin the EQUIVALENCE — identical
closed-session rows on in-order, swapped, and deep-late replays — and
the state-shape claim (state rows = buckets, not users)."""

import os
import shutil
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from streaming_state_scale import run_state_scale  # noqa: E402

N_USERS, N_EVENTS, N_SLOTS = 2_000, 40_000, 8


def _both(spark, order):
    u = run_state_scale(spark, N_USERS, N_EVENTS, N_SLOTS, order=order,
                        watermark_slots=2, operator="user",
                        want_digest=True)
    b = run_state_scale(spark, N_USERS, N_EVENTS, N_SLOTS, order=order,
                        watermark_slots=2, operator="bucket",
                        n_buckets=32, want_digest=True)
    return u, b


def test_bucketed_equals_user_in_order(spark):
    u, b = _both(spark, None)
    assert b["session_set_digest"] == u["session_set_digest"]
    assert b["dropped_by_watermark"] == u["dropped_by_watermark"] == 0
    # the state-shape claim: rows collapse to the bucket count while
    # the per-user run holds one row per open tail
    assert b["max_state_rows"] <= 32
    assert u["max_state_rows"] > 32


def test_bucketed_equals_user_under_disorder(spark):
    swap = list(range(N_SLOTS))
    for i in range(0, N_SLOTS - 1, 2):
        swap[i], swap[i + 1] = swap[i + 1], swap[i]
    u, b = _both(spark, swap)
    assert b["session_set_digest"] == u["session_set_digest"]
    assert b["dropped_by_watermark"] == u["dropped_by_watermark"] == 0


def test_bucketed_equals_user_deep_late(spark):
    deep = list(range(1, N_SLOTS)) + [0]
    u, b = _both(spark, deep)
    assert b["session_set_digest"] == u["session_set_digest"]
    # the oldest window lands beyond the watermark in BOTH engines:
    # exact same drop accounting
    assert b["dropped_by_watermark"] == u["dropped_by_watermark"]
    assert b["dropped_by_watermark"] == N_EVENTS // N_SLOTS


def test_bucketed_multibatch_tail_and_late_semantics(spark):
    """Targeted micro-stream: tail continuation across batches, a tail
    closed by a visible gap, a late event inside tolerance, and a
    too-late event older than the tail start (discarded) — the per-user
    operator's documented cases, replayed through the bucketed one."""
    from parquet_playground_rs_spark.streaming.sessions import (
        sessionize_stream, sessionize_stream_bucketed,
    )

    base = 1_700_000_000
    batches = [
        # (event_id, user_id, ts, value)
        [(0, 1, base + 0, 1.0), (1, 1, base + 60, 2.0),
         (2, 2, base + 0, 5.0)],
        # u1 continues (gap 100 <= 300); u2 gap 500 > 300 closes its
        # tail (and keeps the watermark at base-100 so the next
        # batch's late event is still inside tolerance)
        [(3, 1, base + 160, 3.0), (4, 2, base + 500, 7.0)],
        # late u1 event INSIDE tolerance (after tail start, before the
        # tail's last ts — the running-max guard case)
        [(5, 1, base + 100, 10.0), (6, 3, base + 650, 1.0)],
        # far future advances watermark; earlier tails time out
        [(7, 9, base + 99000, 0.0)],
    ]

    def run(op, **kw):
        in_dir = tempfile.mkdtemp()
        out = tempfile.mkdtemp()
        m0 = 1_000_000_000
        for i, evs in enumerate(batches):
            df = spark.createDataFrame(
                [(e, u, "evt", t, v, "{}") for e, u, t, v in evs],
                "event_id bigint, user_id bigint, event_type string, "
                "ts_raw bigint, value double, props string") \
                .withColumn("ts", F.to_timestamp(F.col("ts_raw"))) \
                .select("event_id", "user_id", "event_type", "ts",
                        "value", "props")
            tmp = tempfile.mkdtemp()
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = next(p for p in sorted(os.listdir(tmp))
                       if p.endswith(".parquet"))
            dst = os.path.join(in_dir, f"b{i}.parquet")
            shutil.move(os.path.join(tmp, src), dst)
            os.utime(dst, (m0 + i * 10, m0 + i * 10))
        q = op(spark, in_dir, out, gap_sec=300.0,
               watermark="600 seconds", max_files_per_trigger=1, **kw)
        q.processAllAvailable()
        q.stop()
        rows = sorted(map(tuple,
                          spark.read.parquet(f"{out}/data").collect()))
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        return rows

    a = run(sessionize_stream)
    b = run(sessionize_stream_bucketed, n_buckets=4)
    assert a == b
    # sanity on content, not just equality: u1's one session includes
    # the late event (4 events, value 16), u2 closed two sessions
    by_user = {}
    for r in a:
        by_user.setdefault(r[0], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0][3] == 4
    assert by_user[1][0][4] == pytest.approx(16.0)
    assert len(by_user[2]) == 2
