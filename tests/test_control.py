"""Control-plane / lifecycle operator tests (requests queue, run
rotation, pair-score increments, description join, heartbeat fill)."""

from __future__ import annotations

import pandas as pd
import pytest

from epicsarchiver_spark.operators.control import (
    MAX_EPOCH,
    apply_requests,
    desc_join,
    increment_pair_scores,
    rotate_runs,
)
from epicsarchiver_spark.operators.deadband import heartbeat_fill


def test_apply_requests(spark):
    pv = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["A.VAL", "B.VAL", "C.VAL", "D.VAL"],
                "active": ["yes", "yes", "no", "yes"],
            }
        )
    )
    requests = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 5],
                "pvname": ["B.VAL", "C.VAL", "D.VAL", "D.VAL", "E.VAL"],
                "ts": [1.0, 2.0, 3.0, 4.0, 5.0],
                "action": ["suspend", "add", "drop", "ignore", "add"],
            }
        )
    )
    got = {(r.pvname, r.active) for r in apply_requests(pv, requests).collect()}
    # B suspended; C re-activated; D's latest action is 'ignore' (keeps row,
    # earlier drop superseded); E added fresh
    assert got == {
        ("A.VAL", "yes"),
        ("B.VAL", "no"),
        ("C.VAL", "yes"),
        ("D.VAL", "yes"),
        ("E.VAL", "yes"),
    }


def test_apply_requests_drop_wins_when_latest(spark):
    pv = spark.createDataFrame(pd.DataFrame({"pvname": ["X.VAL"], "active": ["yes"]}))
    requests = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2], "pvname": ["X.VAL", "X.VAL"], "ts": [1.0, 2.0], "action": ["add", "drop"]}
        )
    )
    assert apply_requests(pv, requests).count() == 0


def test_rotate_runs(spark):
    runs = spark.createDataFrame(
        pd.DataFrame(
            {
                "db": ["r1", "r2"],
                "start_time": [0.0, 100.0],
                "stop_time": [100.0, MAX_EPOCH],
            }
        )
    )
    got = {(r.db, r.start_time, r.stop_time) for r in rotate_runs(runs, 250.0, "r3").collect()}
    assert got == {
        ("r1", 0.0, 100.0),
        ("r2", 100.0, 250.0),
        ("r3", 250.0, MAX_EPOCH),
    }


def test_increment_pair_scores(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"pv1": ["A", "B"], "pv2": ["B", "C"], "score": [5, 499999]})
    )
    new = spark.createDataFrame(
        # reversed order (B,A) must canonicalize onto (A,B); (C,B)+2 hits the cap
        pd.DataFrame({"pv1": ["B", "C", "A"], "pv2": ["A", "B", "Z"], "score": [1, 2, 1]})
    )
    got = {(r.pv1, r.pv2, r.score) for r in increment_pair_scores(pairs, new).collect()}
    assert got == {("A", "B", 6), ("B", "C", 500000), ("A", "Z", 1)}


def test_desc_join(spark):
    cache = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["M1.VAL", "M1.DESC", "M2.VAL"],
                "value": ["3.5", "Sample X motor", "7"],
            }
        )
    )
    got = {(r.pvname, r.description) for r in desc_join(cache).collect()}
    assert got == {("M1.VAL", "Sample X motor"), ("M2.VAL", None)}


def test_heartbeat_fill_floor(spark):
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["A"] * 3,
                "event_id": [1, 2, 3],
                "time": [0.0, 10.0, 250.0],  # 240 s gap, 100 s floor
                "value": [1.0, 2.0, 3.0],
            }
        )
    )
    got = heartbeat_fill(pts, max_silence=100.0).collect()
    hb = sorted((r.time, r.value) for r in got if r.is_heartbeat)
    assert hb == [(110.0, 2.0), (210.0, 2.0)]  # held value repeated
    times = sorted(r.time for r in got)
    assert max(b - a for a, b in zip(times, times[1:])) <= 100.0


def test_instrument_restore_list_and_frame_agree(spark):
    from epicsarchiver_spark.operators.control import instrument_restore

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["A", "A", "B", "B", "C"],
                "event_id": [1, 2, 3, 4, 5],
                "time": [10.0, 20.0, 5.0, 30.0, 12.0],
                "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
    )
    members = ["A", "B", "ZZ:missing"]
    via_list = {
        (r.pvname, r.time, r.value)
        for r in instrument_restore(pts, members, 25.0).collect()
    }
    mdf = spark.createDataFrame([(m,) for m in members], "pvname string")
    via_frame = {
        (r.pvname, r.time, r.value)
        for r in instrument_restore(pts, mdf, 25.0).collect()
    }
    # as-of 25: A→(20,2.0), B→(5,3.0); C not a member; missing PV absent
    assert via_list == via_frame == {("A", 20.0, 2.0), ("B", 5.0, 3.0)}
    # literal-list path pushes membership into the scan: no join in plan
    plan = instrument_restore(pts, members, 25.0)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_save_restore_position_by_name(spark):
    from epicsarchiver_spark.operators.control import restore_position, save_position

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["A", "A", "B", "B"],
                "event_id": [1, 2, 3, 4],
                "time": [10.0, 20.0, 5.0, 30.0],
                "value": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    pos = save_position(None, spark, "beamline", "park", 15.0)
    pos = save_position(pos, spark, "beamline", "run", 25.0)
    pos = save_position(pos, spark, "beamline", "park", 12.0)  # re-save wins
    assert sorted((r.instrument, r.position, r.ts) for r in pos.collect()) == [
        ("beamline", "park", 12.0),
        ("beamline", "run", 25.0),
    ]
    got = {
        (r.pvname, r.time, r.value)
        for r in restore_position(pts, pos, ["A", "B"], "beamline", "park").collect()
    }
    assert got == {("A", 10.0, 1.0), ("B", 5.0, 3.0)}
    with pytest.raises(KeyError):
        restore_position(pts, pos, ["A"], "beamline", "nope")


def test_check_liveness(spark):
    from epicsarchiver_spark.operators.control import check_liveness

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pvname": ["A", "A", "B"],
                "time": [100.0, 950.0, 100.0],
                "value": [1.0, 2.0, 3.0],
            }
        )
    )
    glob = check_liveness(pts, now=1000.0, cadence_s=600.0).head()
    assert glob.n_recent == 1 and bool(glob.alive)
    per = {r.pvname: r.n_recent for r in check_liveness(pts, 1000.0, 600.0, by="pvname").collect()}
    assert per == {"A": 1}  # B silent -> absent (dead)
    dead = check_liveness(pts, now=10_000.0, cadence_s=600.0).head()
    assert dead.n_recent == 0 and not bool(dead.alive)


def test_upsert_alerts_null_status_import_survives_edit(spark):
    """An externally-imported alerts row with NULL status must be PATCHED
    by an edit of its key, not silently deleted — rule existence is marked
    by a literal flag stamped pre-join, never by a nullable data column."""
    from epicsarchiver_spark.operators.control import ALERT_EDIT_COLS, upsert_alerts

    alerts = spark.createDataFrame(
        [("IMP:x.VAL", "gt", "imported", None, None, 5.0, 30.0, "yes", None)],
        "pvname string, compare string, name string, mailto string, "
        "mailmsg string, trippoint double, timeout double, active string, "
        "status string",
    )
    edits = spark.createDataFrame(
        [(1, 1.0, "edit", "IMP:x.VAL", "gt", None, None, None, 9.0, None, None)],
        "id long, ts double, action string, pvname string, compare string, "
        "name string, mailto string, mailmsg string, trippoint double, "
        "timeout double, active string",
    )
    got = upsert_alerts(alerts, edits).collect()
    assert len(got) == 1
    row = got[0]
    # patched trippoint, kept name, NULL status coalesced to engine default
    assert row.trippoint == 9.0 and row.name == "imported" and row.status == "ok"
    assert set(got[0].asDict()) == {"pvname", "compare", "status", *ALERT_EDIT_COLS}
