"""Connected-components dedup + stateful streaming sessionization."""

import time

import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.operators import components


def test_connected_components_basic(spark):
    # two clusters {1,2,3,7} (chain) and {10,11}, singleton edges none
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11)], "doc_a long, doc_b long")
    got = {r["id"]: r["comp"]
           for r in components.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_order_invariant(spark):
    # same graph, reversed/duplicated edges
    pairs = spark.createDataFrame(
        [(7, 3), (2, 1), (3, 2), (11, 10), (2, 3)], "doc_a long, doc_b long")
    got = {r["id"]: r["comp"]
           for r in components.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dedup_by_components(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 7, 10, 11, 99]],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11)], "doc_a long, doc_b long")
    kept = {r["doc_id"]
            for r in components.dedup_by_components(docs, pairs).collect()}
    assert kept == {1, 10, 99}


def test_asof_join_semantics(spark):
    from parquet_playground_rs_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 100), (3, 7)],
        "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (2, 100, 9.0), (2, 50, 8.0)],
        "user_id long, ts long, rv double")
    got = {(r["user_id"], r["ts"]): r["rv_asof"]
           for r in asof_join(left, right, on="ts", by="user_id",
                              value_cols=["rv"]).collect()}
    assert got == {
        (1, 10): 1.0,   # tie: right.ts == left.ts matches
        (1, 20): 2.0,   # latest at-or-before
        (1, 5): None,   # nothing before
        (2, 100): 9.0,  # tie beats the earlier 8.0
        (3, 7): None,   # key with no right rows
    }
    # plan shape: one shuffle by key, no join node (union trick)
    plan = asof_join(left, right, value_cols=["rv"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan.replace("union", "")


def test_range_join_buckets_semantics(spark):
    from parquet_playground_rs_spark.operators.asof import range_join_buckets

    left = spark.createDataFrame(
        [(1, 1, 50), (2, 1, 100), (3, 1, 150), (4, 1, 249),
         (5, 1, 250), (6, 2, 100)],
        "event_id long, user_id long, sec long")
    right = spark.createDataFrame(
        # interval spanning multiple narrow buckets + boundary-inclusive
        [(1, 100, 249, 7.0), (2, 100, 100, 9.0)],
        "user_id long, start long, end long, value double")
    out = range_join_buckets(left, right, point="sec", start="start",
                             end="end", by="user_id", bucket_width=16)
    got = {(r["event_id"], r["value"]) for r in out.collect()}
    # user 1: events 100/150/249 fall in the wide [100,249] interval
    # (boundaries inclusive), 50 and 250 do not; user 2: event 100 hits
    # the degenerate [100,100] interval
    assert got == {(2, 7.0), (3, 7.0), (4, 7.0), (6, 9.0)}
    # brute-force parity on random data
    import random
    random.seed(5)
    L = [(i, random.randint(1, 3), random.randint(0, 500)) for i in range(120)]
    R = [(random.randint(1, 3), s, s + random.randint(0, 80), float(i))
         for i, s in enumerate(random.sample(range(0, 500), 25))]
    ldf = spark.createDataFrame(L, "event_id long, user_id long, sec long")
    rdf = spark.createDataFrame(R, "user_id long, start long, end long, value double")
    fast = {(r["event_id"], r["value"])
            for r in range_join_buckets(ldf, rdf, point="sec", by="user_id",
                                        bucket_width=37).collect()}
    slow = {(e, v) for (e, u, s) in L for (ru, lo, hi, v) in R
            if u == ru and lo <= s <= hi}
    assert fast == slow


def _expected_sessions(events, gap):
    """Reference batch sessionization: list of (user, start, end, n, sum)
    including the open tail."""
    out = []
    by_user = {}
    for e in sorted(events, key=lambda e: (e[1], e[3])):
        by_user.setdefault(e[1], []).append(e)
    for uid, evs in by_user.items():
        cur = [evs[0]]
        for e in evs[1:]:
            if e[3] - cur[-1][3] > gap:
                out.append((uid, cur[0][3], cur[-1][3], len(cur),
                            sum(x[4] for x in cur)))
                cur = [e]
            else:
                cur.append(e)
        out.append((uid, cur[0][3], cur[-1][3], len(cur),
                    sum(x[4] for x in cur)))
    return out


def test_streaming_sessionize(spark, tmp_path):
    from parquet_playground_rs_spark.streaming.sessions import sessionize_stream

    in_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions_out")
    base = 1_600_000_000
    # user 1: two sessions split by a 1000s gap; user 2: one session
    wave1 = [
        (1, 1, "click", base + 0, 1.0, "{}"),
        (2, 1, "click", base + 100, 2.0, "{}"),
        (3, 2, "view", base + 50, 5.0, "{}"),
        (4, 1, "click", base + 1200, 3.0, "{}"),  # gap 1100 > 300 -> new
    ]
    # wave 2: user 1 continues session 2; user 2 starts session 2
    wave2 = [
        (5, 1, "buy", base + 1300, 4.0, "{}"),
        (6, 2, "view", base + 2000, 6.0, "{}"),   # gap 1950 -> new session
    ]

    def write_wave(events):
        df = (
            spark.createDataFrame(
                list(events),
                "event_id long, user_id long, event_type string, "
                "ts_sec long, value double, props string")
            .withColumn("ts", F.col("ts_sec").cast("timestamp"))
            .select("event_id", "user_id", "event_type", "ts", "value",
                    "props")
        )
        # one file per wave: a wave split across micro-batches could let
        # an event-time timeout fire on a partial tail between the files
        # (legal streaming behavior, but it would make the expected-set
        # assertion racy)
        df.coalesce(1).write.mode("append").parquet(in_dir)

    write_wave(wave1)
    q = sessionize_stream(spark, in_dir, out_dir, gap_sec=300.0,
                          watermark="1 seconds")
    try:
        q.processAllAvailable()
        write_wave(wave2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["value_sum"])
           for r in spark.read.parquet(f"{out_dir}/data").collect()}
    all_events = [(e[0], e[1], e[2], e[3], e[4]) for e in wave1 + wave2]
    expected_all = _expected_sessions(all_events, 300)
    # closed sessions = all except each user's open tail
    tails = {}
    for s in expected_all:
        if s[0] not in tails or s[1] > tails[s[0]][1]:
            tails[s[0]] = s
    expected_closed = {(s[0], float(s[1]), float(s[2]), s[3], float(s[4]))
                       for s in expected_all if s != tails[s[0]]}
    assert expected_closed <= got
    # nothing bogus: every emitted session is one of the expected ones
    expected_any = {(s[0], float(s[1]), float(s[2]), s[3], float(s[4]))
                    for s in expected_all}
    assert got <= expected_any


def test_asof_join_null_payload_from_latest_row(spark):
    """ADVICE r2: a NULL value column on the MATCHED (latest) right row must
    stay NULL — not fall back to an older right row — and with multiple
    value_cols every output column must come from the SAME right row."""
    from parquet_playground_rs_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20), (1, 12)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0, "a"), (1, 15, None, "b")],
        "user_id long, ts long, rv double, tag string")
    got = {(r["user_id"], r["ts"]): (r["rv_asof"], r["tag_asof"])
           for r in asof_join(left, right, on="ts", by="user_id",
                              value_cols=["rv", "tag"]).collect()}
    assert got == {
        (1, 20): (None, "b"),  # latest row's NULL preserved; cols same row
        (1, 12): (1.0, "a"),
    }


class _FakeGroupState:
    """Minimal stand-in for pyspark GroupState (unit-testing the pandas fn)."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def test_sessionize_group_stale_tail_closes_at_own_end():
    """ADVICE r2 high: stored open tail + first batch event beyond gap_sec
    used to IndexError on the empty sid-0 segment. The stale tail must
    close at ITS OWN last event (not a batch timestamp) and the batch must
    start a fresh session."""
    import pandas as pd

    from parquet_playground_rs_spark.streaming.sessions import _sessionize_group

    state = _FakeGroupState((100.0, 200.0, 2, 3.0))  # start, last, n, sum
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([1000.0, 1050.0], unit="s"),
        "value": [1.0, 2.0],
    })
    out = list(_sessionize_group((7,), iter([pdf]), state, 300.0))
    closed = [tuple(r) for df in out for r in df.itertuples(index=False)]
    assert closed == [(7, 100.0, 200.0, 2, 3.0)]
    assert state.get == (1000.0, 1050.0, 2, 3.0)


def test_sessionize_group_alive_tail_continues():
    """Complement: a tail within gap_sec of the batch extends, not closes."""
    import pandas as pd

    from parquet_playground_rs_spark.streaming.sessions import _sessionize_group

    state = _FakeGroupState((100.0, 900.0, 2, 3.0))
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([1000.0, 1050.0], unit="s"),
        "value": [1.0, 2.0],
    })
    out = list(_sessionize_group((7,), iter([pdf]), state, 300.0))
    assert out == []  # nothing closes; tail extends
    assert state.get == (100.0, 1050.0, 4, 6.0)


def test_streaming_sessionize_watermark_outlives_gap(spark, tmp_path):
    """End-to-end repro of the ADVICE r2 high: watermark (10 min) > gap
    (300 s), so state routinely outlives the session boundary; a mid-size
    gap used to kill the streaming query with IndexError."""
    from parquet_playground_rs_spark.streaming.sessions import sessionize_stream

    in_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions_out")
    base = 1_600_000_000

    def write_wave(events):
        df = (
            spark.createDataFrame(
                list(events),
                "event_id long, user_id long, event_type string, "
                "ts_sec long, value double, props string")
            .withColumn("ts", F.col("ts_sec").cast("timestamp"))
            .select("event_id", "user_id", "event_type", "ts", "value",
                    "props"))
        df.coalesce(1).write.mode("append").parquet(in_dir)

    write_wave([(1, 1, "click", base + 0, 1.0, "{}"),
                (2, 1, "click", base + 100, 2.0, "{}")])
    q = sessionize_stream(spark, in_dir, out_dir, gap_sec=300.0,
                          watermark="10 minutes")
    try:
        q.processAllAvailable()
        # gap 900 > 300 but watermark hasn't fired the timeout: the batch
        # path itself must close the stale tail at base+100
        write_wave([(3, 1, "click", base + 1000, 4.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["value_sum"])
           for r in spark.read.parquet(f"{out_dir}/data").collect()}
    assert (1, float(base), float(base + 100), 2, 3.0) in got


def test_asof_join_ddl_hostile_column_names(spark):
    """Review r3: value columns whose names the DDL parser rejects
    (spaces) must still join — the null-struct cast uses the DataType
    object, not a dtypes string round-trip."""
    from parquet_playground_rs_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20)], "user_id long, ts long")
    right = spark.createDataFrame([(1, 10, 5.0)], "user_id long, ts long, `r v` double")
    got = asof_join(left, right, on="ts", by="user_id",
                    value_cols=["r v"]).collect()
    assert got[0]["r v_asof"] == 5.0


def test_sessionize_group_late_events_never_regress_state():
    """Review r3: late (out-of-order across micro-batches) events must not
    move last_ts/session_end/timeout backwards, must not mis-split a
    session that straddles a late event, and events older than the open
    tail's start are discarded."""
    import pandas as pd

    from parquet_playground_rs_spark.streaming.sessions import _sessionize_group

    def run(state_v, batch_ts):
        st = _FakeGroupState(state_v)
        pdf = pd.DataFrame({"ts": pd.to_datetime(batch_ts, unit="s"),
                            "value": [1.0] * len(batch_ts)})
        out = list(_sessionize_group((7,), iter([pdf]), st, 300.0))
        closed = [tuple(r) for df in out for r in df.itertuples(index=False)]
        return st, closed

    # late event inside the open session + a continuing event: one session,
    # end never regresses, no false split (1300 is 200s after last0=1100)
    st, closed = run((1000.0, 1100.0, 2, 3.0), [1050.0, 1300.0])
    assert closed == []
    assert st.get == (1000.0, 1300.0, 4, 5.0)
    # purely-late batch: state absorbs the event, end stays at 1100
    st, closed = run((1000.0, 1100.0, 2, 3.0), [1050.0])
    assert closed == []
    assert st.get == (1000.0, 1100.0, 3, 4.0)
    assert st.timeout_ms == int((1100.0 + 300.0) * 1000)
    # ancient event (before the tail started): dropped, state untouched
    st, closed = run((1000.0, 1100.0, 2, 3.0), [900.0])
    assert closed == []
    assert st.get == (1000.0, 1100.0, 2, 3.0)


def test_sessionize_timeout_clamped_above_watermark():
    """Review r3: a straggler batch whose desired timeout sits at/below
    the current watermark must clamp instead of letting Spark throw."""
    import pandas as pd

    from parquet_playground_rs_spark.streaming.sessions import _sessionize_group

    class _WmState(_FakeGroupState):
        def getCurrentWatermarkMs(self):
            return 2_000_000_000

    st = _WmState((1000.0, 1100.0, 2, 3.0))
    pdf = pd.DataFrame({"ts": pd.to_datetime([1050.0], unit="s"),
                        "value": [1.0]})
    list(_sessionize_group((7,), iter([pdf]), st, 300.0))
    assert st.timeout_ms == 2_000_000_001  # watermark + 1, not 1_400_000


def test_asof_join_forward_direction(spark):
    """r3: direction='forward' matches the EARLIEST right row at-or-after
    (ties match), the mirror of the backward default."""
    from parquet_playground_rs_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 35), (2, 5), (3, 7)],
        "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (1, 30, 3.0), (2, 4, 9.0)],
        "user_id long, ts long, rv double")
    got = {(r["user_id"], r["ts"]): r["rv_asof"]
           for r in asof_join(left, right, on="ts", by="user_id",
                              value_cols=["rv"],
                              direction="forward").collect()}
    assert got == {
        (1, 10): 1.0,   # tie matches
        (1, 20): 3.0,   # earliest at-or-after is ts=30
        (1, 35): None,  # nothing after
        (2, 5): None,   # right row is before, not after
        (3, 7): None,   # key with no right rows
    }
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")
