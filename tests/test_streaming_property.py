"""Property tests: multi-batch streaming replays vs their batch twins
(VERDICT r12 #4 — extend the adversarial-fuzz discipline to the
streaming lane).

The registered replay queries drain a SINGLE microbatch, where
watermark/late-data semantics are vacuous. These fuzzes drive the
SAME production plans (operators/events.py helpers + streaming/jobs
stateful ops) through RANDOMIZED multi-batch file-source replays —
random event orderings, random batch splits — and compare against
the batch computation under each operator's documented contract:

- complete-mode aggregation retains all state, so ANY ordering and
  ANY batch split must reproduce the batch answer exactly;
- append-mode aggregation under TIME-ORDERED batch splits (sorted
  events cut at random points) can never drop a row — every row's
  window end exceeds all earlier-batch timestamps — so the drained
  output must equal the batch answer restricted to windows the final
  watermark closed (end <= global_max_ts - delay, equality emitted);
- dropDuplicatesWithinWatermark must never emit a key twice nor a
  row that wasn't in the input, for ANY ordering and split (emission
  timing and which duplicate survives are non-contractual — see the
  test's docstring for the empirical behavior);
- applyInPandasWithState running totals use order-free exact-cent
  integers, so the last update per user equals the batch aggregate
  for ANY ordering and split.

Engine-behavior pins (empirically established, encoded in the append
model): the watermark used for state eviction/emission in batch k is
computed from data through batch k-1; availableNow runs a final
no-data batch that advances the watermark and flushes; a window whose
end EQUALS the watermark is emitted; the late-row input filter lags
the eviction watermark by one batch (a row for a still-live window
merges even when its window end is behind the displayed watermark) —
which is why the no-late-rows regime, not a drop model, is the sound
basis for the append property.

Soak knob: STREAM_FUZZ_SCALE multiplies every max_examples (CI keeps
1; a soak run sets 10+ and reports like the codec census in
docs/SCALE.md).
"""

from __future__ import annotations

import itertools
import os as _os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.events import (
    session_windows,
    tumbling_counts,
)
from mapreduce_lab_spark.streaming.jobs import (
    streaming_dedup,
    streaming_running_totals,
)
from mapreduce_lab_spark.streaming.replay import _drain

_FUZZ = max(1, int(_os.environ.get("STREAM_FUZZ_SCALE", "1")))
_DIRS = itertools.count()

DELAY_SEC = 30 * 60  # matches jobs.WATERMARK = "30 minutes"
HOUR = 3600

# (ts_sec, user_id, event_type, cents). Values are exact cents so the
# to_units() rounding in both engines is never near a half-cent.
EVENT = st.tuples(
    st.integers(min_value=0, max_value=10 * HOUR),
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["view", "purchase"]),
    st.integers(min_value=-999, max_value=999),
)
EVENTS = st.lists(EVENT, min_size=1, max_size=30)
# Cut the (possibly sorted) event list into 1-4 batches.
CUTS = st.lists(st.integers(min_value=1, max_value=29), max_size=3, unique=True)


def _split(events, cuts):
    bounds = sorted({c for c in cuts if c < len(events)})
    out, prev = [], 0
    for b in bounds:
        out.append(events[prev:b])
        prev = b
    out.append(events[prev:])
    return [b for b in out if b]


def _write_batches(tmp_path, batches):
    d = str(tmp_path / f"stream{next(_DIRS)}")
    _os.makedirs(d)
    eid = itertools.count()
    for i, rows in enumerate(batches):
        t = pa.table(
            {
                "event_id": pa.array([next(eid) for _ in rows], pa.int64()),
                "ts_sec": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] / 100.0 for r in rows], pa.float64()),
            }
        )
        p = f"{d}/batch{i:03d}.parquet"
        pq.write_table(t, p)
        # File-source batch order follows modification time.
        _os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return d


_SCHEMA = (
    "event_id long, ts_sec long, user_id long, event_type string, value double"
)


def _stream(spark, d):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withColumn("ts", F.timestamp_seconds("ts_sec"))
        .drop("ts_sec")
    )


def _batch_df(spark, events):
    rows = [(i, r[0], r[1], r[2], r[3] / 100.0) for i, r in enumerate(events)]
    return spark.createDataFrame(rows, _SCHEMA).withColumn(
        "ts", F.timestamp_seconds("ts_sec")
    ).drop("ts_sec")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@settings(
    max_examples=5 * _FUZZ,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS)
def test_complete_mode_tumbling_matches_batch_on_any_split(
    spark, tmp_path_factory, events, cuts
):
    """Complete mode retains all state: random order, random batch
    splits, late data — the final snapshot must equal the batch twin
    on the full event set."""
    d = _write_batches(tmp_path_factory.mktemp("s"), _split(events, cuts))
    got = _drain(tumbling_counts(_stream(spark, d)), "complete")
    want = tumbling_counts(_batch_df(spark, events))
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


@settings(
    max_examples=5 * _FUZZ,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS)
def test_complete_mode_sessions_merge_across_batches(
    spark, tmp_path_factory, events, cuts
):
    """Session windows in complete mode: sessions straddling batch
    boundaries (and arriving out of order) must merge to exactly the
    batch twin's gaps-and-islands answer."""
    d = _write_batches(tmp_path_factory.mktemp("s"), _split(events, cuts))
    got = _drain(session_windows(_stream(spark, d)), "complete")
    want = session_windows(_batch_df(spark, events))
    cols = ["user_id", "session_start", "n_events", "session_value"]
    assert _rows(got, cols) == _rows(want, cols)


@settings(
    max_examples=5 * _FUZZ,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS)
def test_append_mode_tumbling_emits_watermark_closed_windows(
    spark, tmp_path_factory, events, cuts
):
    """Append mode under time-ordered batch splits (no droppable
    rows): drained output == batch answer restricted to windows the
    final watermark closed (window end <= max_ts - delay; equality
    emitted — pinned below)."""
    events = sorted(events)
    d = _write_batches(tmp_path_factory.mktemp("s"), _split(events, cuts))
    sdf = tumbling_counts(
        _stream(spark, d).withWatermark("ts", "30 minutes")
    )
    got = _drain(sdf, "append")
    final_wm = max(r[0] for r in events) - DELAY_SEC
    closed = {ws for ws in range(0, 11 * HOUR, HOUR) if ws + HOUR <= final_wm}
    want = tumbling_counts(_batch_df(spark, events)).withColumn(
        "ws", F.unix_timestamp("window_start", "yyyy-MM-dd HH:mm:ss")
    )
    want = want.where(F.col("ws").isin(list(closed)) if closed else F.lit(False))
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_append_emission_boundary_pins(spark, tmp_path_factory):
    """Deterministic pins for the model above (see module docstring):
    a window whose end EQUALS the final watermark is emitted; one
    second short is not; the availableNow flush batch emits windows
    even when the closing event arrives in the last file."""
    # max ts = 2:30h -> final wm = 2:00h: [0,1) and [1,2) emitted
    # (end 2:00 == wm), [2,3) held back.
    events = [(600, 0, "view", 100), (4200, 0, "view", 100),
              (9000, 1, "purchase", 50)]
    d = _write_batches(tmp_path_factory.mktemp("s"), [events[:2], events[2:]])
    got = _drain(
        tumbling_counts(_stream(spark, d).withWatermark("ts", "30 minutes")),
        "append",
    )
    assert _rows(got, ["window_start", "n_events"]) == [
        ("1970-01-01 00:00:00", 1),
        ("1970-01-01 01:00:00", 1),
    ]
    # One second earlier (max ts 1:59:59 -> wm 1:29:59): [1,2) not closed.
    events = [(600, 0, "view", 100), (7199, 0, "view", 100)]
    d = _write_batches(tmp_path_factory.mktemp("s"), [events])
    got = _drain(
        tumbling_counts(_stream(spark, d).withWatermark("ts", "30 minutes")),
        "append",
    )
    assert _rows(got, ["window_start", "n_events"]) == [("1970-01-01 00:00:00", 1)]


@settings(
    max_examples=5 * _FUZZ,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS)
@example(  # round-14 falsifier: key spread > watermark eviction horizon
    events=[
        (10707, 0, "view", 0),
        (0, 0, "view", 0),
        (6929, 1, "purchase", 0),
        (12065, 1, "purchase", 0),
    ],
    cuts=[1, 3],
)
def test_dedup_within_watermark_never_duplicates_or_fabricates(
    spark, tmp_path_factory, events, cuts
):
    """dropDuplicatesWithinWatermark's append-mode contract has two
    halves. The DEDUP half is what this fuzz pins across random
    orderings and batch splits — but only as far as the API actually
    promises it (round-14 falsifier, pinned above): state for a key
    inserted at event time t is evicted once the global watermark
    (max seen ts - delay) passes t + delay, so a duplicate arriving
    after OTHER events have pushed max ts beyond t + 2·delay is
    legitimately re-emitted — "within watermark" is the name for a
    reason. The sound invariant: a key whose first occurrence
    satisfies max(all ts) <= min(key ts) + 2·delay can never have its
    state evicted mid-stream, so it is emitted AT MOST ONCE; and every
    emitted row is a genuine input row (event_id round-trips to an
    input event with the same key). The LIVENESS half — when (and
    with which surviving row) a key is emitted — is engine-internal
    timing the docs leave open. The registered single-batch replay
    keeps the stronger emitted == DISTINCT oracle, which holds on
    full replays of the events table."""
    d = _write_batches(tmp_path_factory.mktemp("s"), _split(events, cuts))
    got = [
        (r["user_id"], r["event_type"], r["event_id"])
        for r in _drain(streaming_dedup(_stream(spark, d)), "append").collect()
    ]
    keys = [(u, e) for u, e, _ in got]
    first_ts: dict[tuple, int] = {}
    for t, u, e, _v in events:
        k = (u, e)
        first_ts[k] = min(first_ts.get(k, t), t)
    gmax = max(t for t, _u, _e, _v in events)
    protected = {k for k, t in first_ts.items() if gmax <= t + 2 * DELAY_SEC}
    emitted = sorted(k for k in keys if keys.count(k) > 1 and k in protected)
    assert emitted == [], f"evergreen key emitted twice: {emitted}"
    by_id = {i: (r[1], r[2]) for i, r in enumerate(events)}
    for u, e, eid in got:
        assert by_id.get(eid) == (u, e), f"fabricated row: {(u, e, eid)}"


@settings(
    max_examples=5 * _FUZZ,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, cuts=CUTS)
def test_running_totals_state_accumulates_across_batches(
    spark, tmp_path_factory, events, cuts
):
    """applyInPandasWithState per-user totals: the last update per
    user (max n_events — the count is strictly monotone per touched
    batch) must equal the batch aggregate for any ordering/split,
    because per-row cent conversion is order-free exact integers."""
    d = _write_batches(tmp_path_factory.mktemp("s"), _split(events, cuts))
    got = _drain(streaming_running_totals(_stream(spark, d)), "update")
    finals: dict[int, tuple[int, int]] = {}
    for r in got.collect():
        cur = finals.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            finals[r["user_id"]] = (r["n_events"], r["total_cents"])
    want: dict[int, tuple[int, int]] = {}
    for ts, uid, et, cents in events:
        n, c = want.get(uid, (0, 0))
        want[uid] = (n + 1, c + cents)
    assert finals == want
