"""Driver-side helper tests: parse_times (C10), time_str2sec (C8), mail
template rendering (C17/C18). No Spark needed."""

from __future__ import annotations

from epicsarchiver_spark.functions.mail import clean_mail_message, render_alert_mail
from epicsarchiver_spark.functions.times import parse_times, time_str2sec

NOW = 1705276800.0  # 2024-01-15 00:00:00 UTC


def test_parse_times_relative():
    t0, t1 = parse_times("3 days ago", "now", now=NOW)
    assert (t0, t1) == (NOW - 3 * 86400, NOW)
    t0, t1 = parse_times("2 hours", "now", now=NOW)
    assert (t0, t1) == (NOW - 7200, NOW)


def test_parse_times_default_week():
    t0, t1 = parse_times(None, None, now=NOW)
    assert (t0, t1) == (NOW - 7 * 86400, NOW)


def test_parse_times_absolute_and_swap():
    t0, t1 = parse_times("2024-01-10", "2024-01-05", now=NOW)
    assert t0 < t1
    assert t1 - t0 == 5 * 86400


def test_time_str2sec_lenient():
    assert time_str2sec("2024-01-10 12:30:15", NOW) == 1704889815.0
    assert time_str2sec("2024-01-10", NOW) == 1704844800.0
    # missing date -> today (relative to now)
    assert time_str2sec("06:00", NOW) == NOW + 6 * 3600


def test_clean_mail_message():
    assert clean_mail_message("a\\nb\\'c") == "a\nb'c"


def test_render_alert_mail():
    msg = render_alert_mail(
        "PV %PV% = %VALUE% (%COMP% %TRIP%)\\nother: %PV(X.VAL)% / %PV(missing)%",
        pvname="A.VAL",
        value=9.5,
        label="hi-alarm",
        compare="gt",
        trippoint=5.0,
        lookup={"X.VAL": "42"},
    )
    assert "PV A.VAL = 9.5 (gt 5.0)" in msg
    assert "other: 42" in msg
    assert "(unknown PV missing)" in msg
