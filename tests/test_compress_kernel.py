"""Pure-batch invariance tests for the W1/W2 compression kernel
``_compress_step`` — the single copy of the reference's branch logic
(ref archiver.py:386-414), wrapped by the applyInPandasWithState lane.
Driven directly (no streaming query, no Spark) against the
independently-written batch reference
``operators.deadband.compress_reference``: output + final pending state
must be invariant to HOW the stream is micro-batched, because the
state 4-tuple is the only thing that crosses a batch boundary."""

from __future__ import annotations

import pytest

from epicsarchiver_spark.operators.deadband import compress_reference
from epicsarchiver_spark.streaming.ingest import _compress_step


def _drive(batches, deadtime, deadband, seed=None):
    """Thread the state 4-tuple through a list of event batches exactly
    like the streaming kernel does; returns (emitted [(t, v)...], final
    (last_t, last_v, pend_t, pend_v))."""
    last_t = last_v = pend_t = pend_v = None
    if seed is not None:
        last_t, last_v = seed
    out = []
    for batch in batches:
        batch = sorted(batch)  # the kernel sorts each micro-batch by time
        out_t, out_v, last_t, last_v, pend_t, pend_v = _compress_step(
            last_t, last_v, pend_t, pend_v,
            [t for t, _ in batch], [v for _, v in batch],
            deadtime, deadband,
        )
        out.extend(zip(out_t, out_v))
    return out, (last_t, last_v, pend_t, pend_v)


def _with_pending(out, state):
    full = list(out)
    if state[2] is not None:
        full.append((state[2], state[3]))
    return full


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


@pytest.mark.parametrize("split", [1, 2, 3, len(EVENTS)])
def test_kernel_matches_batch_reference_any_batching(split):
    """Output + final pending must equal the one-shot batch reference
    regardless of how the stream is micro-batched — the state tuple
    carries the deadtime window across batch boundaries."""
    n = len(EVENTS)
    size = (n + split - 1) // split
    chunks = [EVENTS[i : i + size] for i in range(0, n, size)]
    out, state = _drive(chunks, DEADTIME, DEADBAND)
    assert _with_pending(out, state) == compress_reference(
        list(EVENTS), DEADTIME, DEADBAND
    )


def test_empty_batch_preserves_state():
    out, state = _drive([EVENTS[:3], [], EVENTS[3:]], DEADTIME, DEADBAND)
    assert _with_pending(out, state) == compress_reference(
        list(EVENTS), DEADTIME, DEADBAND
    )


def test_out_of_order_within_batch_sorted():
    """Each micro-batch is time-sorted before the kernel (the streaming
    kernel argsorts); a shuffled batch must match the ordered run."""
    shuffled = [[EVENTS[3], EVENTS[0], EVENTS[2], EVENTS[1]], EVENTS[4:]]
    out, state = _drive(shuffled, DEADTIME, DEADBAND)
    assert _with_pending(out, state) == compress_reference(
        list(EVENTS), DEADTIME, DEADBAND
    )


def test_seeded_state_continues_window():
    """Warm start (the seeds=/seed_col= lanes): seeding (last_t, last_v)
    from the newest archived point means the first post-restart event is
    gated by the continuing deadtime window, not re-emitted — the batch
    reference over seed+events minus the seed row itself."""
    out, state = _drive([EVENTS[1:]], DEADTIME, DEADBAND, seed=EVENTS[0])
    ref = compress_reference(list(EVENTS), DEADTIME, DEADBAND)
    assert ref[0] == EVENTS[0]
    assert _with_pending(out, state) == ref[1:]
