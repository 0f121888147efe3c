"""tools/rotate_front.py ordering semantics: never-certified keys first,
then since-REGRESSED keys (latest driver row red despite an older green),
then green keys oldest-round-first — the r9 ADVICE fix."""

from __future__ import annotations

import json


def _write(tmp_path, rnd, rows):
    p = tmp_path / f"CORRECTNESS_r{rnd:02d}.json"
    p.write_text(json.dumps(rows))
    return str(p)


def _row(ok: bool):
    return {"rows_match": ok, "schema_match": ok, "hash_match": ok}


def test_regressed_key_gets_reproof_priority(tmp_path):
    from tools.rotate_front import driver_history

    files = [
        _write(tmp_path, 3, {"a": _row(True), "b": _row(True), "c": _row(True)}),
        # round 5: b regresses, a re-certifies, c absent, d appears green
        _write(tmp_path, 5, {"a": _row(True), "b": _row(False), "d": _row(True)}),
    ]
    green, latest = driver_history(files)
    assert green == {"a": 5, "b": 3, "c": 3, "d": 5}
    assert latest["b"] == (5, False)  # newest row red → re-proof bucket
    assert latest["a"] == (5, True)
    assert latest["c"] == (3, True)

    # compute_front ordering, replayed on the same history: regressed 'b'
    # must sort with the never-certified keys, ahead of stale-green 'c'
    keys = ["a", "b", "c", "d", "e"]  # e never certified
    never = sorted(k for k in keys if k not in green)
    regressed = sorted(k for k in keys if k in green and not latest[k][1])
    rest = sorted((green[k], k) for k in keys if k in green and k not in regressed)
    front = never + regressed + [k for _r, k in rest]
    assert front == ["e", "b", "c", "a", "d"]
