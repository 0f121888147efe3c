"""Pure-batch parity tests for the transformWithState compression
processor (VERDICT r5 task 6): the protobuf-gated part of
``compressed_stream_resumable`` is only the runtime state-server
protocol — the processor CLASS (state round-trip, initial-state seeding,
per-batch kernel calls) is exercised here with a fake handle, no
streaming query and no protobuf, against the independently-written batch
reference ``operators.deadband.compress_reference``."""

from __future__ import annotations

import pandas as pd
import pytest

from epicsarchiver_spark.operators.deadband import compress_reference
from epicsarchiver_spark.streaming.ingest import make_compress_processor


class _FakeValueState:
    def __init__(self):
        self._val = None

    def exists(self) -> bool:
        return self._val is not None

    def get(self):
        return self._val

    def update(self, val) -> None:
        self._val = tuple(val)


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema):
        return self.state


def _drive(proc_cls, batches, initial=None, key=("PV:1",)):
    """Run the processor over a list of event batches; returns
    (emitted [(t, v)...], final state tuple)."""
    proc = proc_cls()
    handle = _FakeHandle()
    proc.init(handle)
    if initial is not None:
        proc.handleInitialState(key, pd.DataFrame(initial, columns=["time", "value"]), None)
    out = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["time", "value"])
        pdf.insert(0, "pvname", key[0])
        for emitted in proc.handleInputRows(key, iter([pdf]), None):
            out.extend(zip(emitted["time"], emitted["value"]))
    proc.close()
    return out, handle.state.get()


EVENTS = [
    (0.0, 10.0),
    (1.0, 10.2),   # inside deadtime → limbo
    (6.5, 10.1),   # past deadtime but sub-deadband → limbo
    (12.0, 25.0),  # past deadtime + past deadband → emit (limbo flushed first)
    (12.5, 25.1),
    (30.0, 80.0),
    (31.0, 80.5),
]
DEADTIME, DEADBAND = 5.0, 1.0


def _expected(events, with_pending=True):
    kept = compress_reference(list(events), DEADTIME, DEADBAND)
    return kept if with_pending else kept


@pytest.mark.parametrize("split", [1, 2, 3, len(EVENTS)])
def test_processor_matches_batch_reference_any_batching(split):
    """Output + final pending must equal the one-shot batch reference
    regardless of how the stream is micro-batched — the state round-trip
    through the ValueState carries the window across batch boundaries."""
    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    # contiguous time-ordered slices — micro-batches split the stream,
    # they don't interleave it
    n = len(EVENTS)
    size = (n + split - 1) // split
    chunks = [EVENTS[i : i + size] for i in range(0, n, size)]
    emitted, state = _drive(proc_cls, chunks)
    # reference output includes the trailing pending point; the processor
    # leaves it in state (flush is the timer's job)
    last_t, last_v, pend_t, pend_v = state
    full = list(emitted)
    if pend_t is not None:
        full.append((pend_t, pend_v))
    assert full == compress_reference(list(EVENTS), DEADTIME, DEADBAND)


def test_initial_state_continues_window_across_restart():
    """handleInitialState seeds (last_t, last_v) from the newest archived
    row with pend=None: the deadtime window CONTINUES across a restart —
    the seeded series' first event is NOT re-emitted, matching the batch
    reference run over seed+events minus the seed row itself."""
    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    seed = [(-3.0, 9.9), (0.0, 10.0)]  # two archived rows; newest wins
    emitted, state = _drive(proc_cls, [EVENTS[1:]], initial=seed)
    last_t, last_v, pend_t, pend_v = state
    full = list(emitted)
    if pend_t is not None:
        full.append((pend_t, pend_v))
    ref = compress_reference([(0.0, 10.0)] + EVENTS[1:], DEADTIME, DEADBAND)
    assert ref[0] == (0.0, 10.0)
    assert full == ref[1:]


def test_initial_state_picks_newest_row():
    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    proc = proc_cls()
    handle = _FakeHandle()
    proc.init(handle)
    proc.handleInitialState(
        ("PV:1",),
        pd.DataFrame({"time": [5.0, 1.0, 3.0], "value": [50.0, 10.0, 30.0]}),
        None,
    )
    assert handle.state.get() == (5.0, 50.0, None, None)


def test_empty_batch_preserves_state():
    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    emitted, state = _drive(proc_cls, [EVENTS[:3], [], EVENTS[3:]])
    last_t, last_v, pend_t, pend_v = state
    full = list(emitted)
    if pend_t is not None:
        full.append((pend_t, pend_v))
    assert full == compress_reference(list(EVENTS), DEADTIME, DEADBAND)


def test_out_of_order_within_batch_sorted():
    """handleInputRows sorts each micro-batch by time before the kernel."""
    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    shuffled = [EVENTS[3], EVENTS[0], EVENTS[2], EVENTS[1]] + EVENTS[4:]
    emitted, state = _drive(proc_cls, [shuffled])
    last_t, last_v, pend_t, pend_v = state
    full = list(emitted)
    if pend_t is not None:
        full.append((pend_t, pend_v))
    assert full == compress_reference(list(EVENTS), DEADTIME, DEADBAND)


def test_resumable_seed_routing_multi_key_contract():
    """The seed-continuation contract of ``compressed_stream_resumable``
    at the FUNCTION's grouping level (VERDICT r6 task 8), no protobuf:
    the initial-state frame groups by pvname exactly like
    ``init_grouped`` — each seeded key gets ONLY its own rows (newest
    wins), unseeded keys start cold and re-emit their first event, and a
    seeded key that sees no events in the run emits nothing and keeps
    its seeded state. Driven per key with the fake handle, mirroring
    transformWithState's per-key state scoping; compared against the
    independent batch reference."""
    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    # seed frame as compressed_stream_resumable receives it: extra
    # columns beyond (pvname, time, value) are dropped by its .select()
    seed_pdf = pd.DataFrame(
        {
            "pvname": ["PV:A", "PV:A", "PV:C"],
            "time": [-3.0, 0.0, 2.0],
            "value": [9.9, 10.0, 77.0],
            "bucket": [1, 1, 2],  # dropped by the select
        }
    )[["pvname", "time", "value"]]
    events = {
        "PV:A": EVENTS[1:],  # seeded: window continues, first event not re-emitted
        "PV:B": EVENTS,      # cold: first event emits
        "PV:C": [],          # seeded, silent this run
    }

    got: dict[str, tuple] = {}
    for key in ("PV:A", "PV:B", "PV:C"):
        proc = proc_cls()
        handle = _FakeHandle()
        proc.init(handle)
        mine = seed_pdf[seed_pdf["pvname"] == key][["time", "value"]]
        if len(mine):  # TWS only calls handleInitialState for seeded keys
            proc.handleInitialState((key,), mine, None)
        out = []
        pdf = pd.DataFrame(events[key], columns=["time", "value"])
        if len(pdf):
            pdf.insert(0, "pvname", key)
            for emitted in proc.handleInputRows((key,), iter([pdf]), None):
                out.extend(zip(emitted["time"], emitted["value"]))
        got[key] = (out, handle.state.get())

    def _with_pending(out, state):
        full = list(out)
        if state is not None and state[2] is not None:
            full.append((state[2], state[3]))
        return full

    # seeded key: reference over (newest seed row + events) minus the seed
    ref_a = compress_reference([(0.0, 10.0)] + EVENTS[1:], DEADTIME, DEADBAND)
    assert _with_pending(*got["PV:A"]) == ref_a[1:]
    # cold key: plain reference, first event included
    assert _with_pending(*got["PV:B"]) == compress_reference(
        list(EVENTS), DEADTIME, DEADBAND
    )
    # silent seeded key: nothing emitted, state is exactly the newest seed
    assert got["PV:C"][0] == []
    assert got["PV:C"][1] == (2.0, 77.0, None, None)


def test_tws_processor_matches_certified_stream_lane(spark, tmp_path):
    """Cross-LANE certification (VERDICT r10 task 5): the TWS processor
    must reproduce, row-exactly, the output of the LIVE
    applyInPandasWithState lane (``compressed_stream`` — the lane the
    driver gate ``stream_compress`` certifies against the recursive-CTE
    oracle) on the same multi-series event stream split across
    micro-batches. Together with the batching-invariance tests above,
    this certifies everything in ``compressed_stream_resumable`` except
    Spark's own transformWithState plumbing, which the two
    protobuf-gated end-to-end tests in test_streaming.py exercise where
    the runtime exists."""
    import random

    from epicsarchiver_spark.streaming.ingest import EVENT_SCHEMA, compressed_stream

    rng = random.Random(41)
    rows = []
    for pv in ("PV:x", "PV:y", "PV:z"):
        t = 0.0
        for _ in range(60):
            t += rng.random() * 6.0
            rows.append((pv, round(t, 3), round(rng.random() * 4, 2)))
    pdf = pd.DataFrame(rows, columns=["pvname", "time", "value"])
    src = tmp_path / "ev"
    src.mkdir()
    for j in range(3):
        pdf.iloc[j * 60 : (j + 1) * 60].to_parquet(
            src / f"p{j}.parquet", index=False
        )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # flush_ms=None: the pending tail stays in state — the exact
    # bounded-run contract compressed_stream_resumable documents
    q = (
        compressed_stream(stream, DEADTIME, DEADBAND, flush_ms=None)
        .writeStream.format("memory")
        .queryName("lane_certified")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    lane = {
        (r.pvname, r.time, r.value)
        for r in spark.sql("select * from lane_certified").collect()
    }

    proc_cls = make_compress_processor(DEADTIME, DEADBAND)
    tws = set()
    for pv in ("PV:x", "PV:y", "PV:z"):
        batches = [
            list(
                zip(
                    (g := pdf.iloc[j * 60 : (j + 1) * 60])
                    .loc[g["pvname"] == pv, "time"],
                    g.loc[g["pvname"] == pv, "value"],
                )
            )
            for j in range(3)
        ]
        emitted, _state = _drive(proc_cls, batches, key=(pv,))
        tws.update((pv, t, v) for t, v in emitted)
    assert tws == lane
