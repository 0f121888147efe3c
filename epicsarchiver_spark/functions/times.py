"""Driver-side time helpers — C8/C10 (SURVEY §2.8).

These produce the (t0, t1) literals that parameterize range reads; they
run on the driver (query-build time), not in the plan, exactly as the
reference parses request parameters before querying
(epicsarchiver/web_utils.py:31-90)."""

from __future__ import annotations

import re
from datetime import datetime, timezone

MAX_EPOCH = 2147483647.0

_UNITS = {
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 7 * 86400.0,
    # month is an ENGINE EXTENSION: the executed reference has no month
    # keyword and silently falls back to its 1-week default for it
    "month": 31 * 86400.0,
    # 525600 minutes — matches the executed reference exactly
    # (web_utils.py:75: 'year' → 525600 min = 365 d, not 365.25)
    "year": 365 * 86400.0,
}

_AGO_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(minute|hour|day|week|month|year)s?(?:\s+ago)?\s*$", re.I)


def time_str2sec(s: str, now: float | None = None) -> float:
    """C8 — lenient 'Y-m-d H:M:S' parse: missing parts default to today /
    midnight (behavioral spec from epicsarchiver/util.py:372-388)."""
    now_dt = datetime.fromtimestamp(now, tz=timezone.utc) if now else datetime.now(timezone.utc)
    s = s.strip()
    date_part, _, time_part = s.partition(" ")
    if "-" in date_part:
        bits = [int(b) for b in date_part.split("-")]
        y, m, d = (bits + [now_dt.month, now_dt.day])[:3]
    else:
        y, m, d = now_dt.year, now_dt.month, now_dt.day
        time_part = s
    hh = mm = ss = 0
    if time_part:
        tb = [int(float(b)) for b in time_part.split(":")]
        hh, mm, ss = (tb + [0, 0])[:3]
    return datetime(y, m, d, hh, mm, ss, tzinfo=timezone.utc).timestamp()


def parse_bound(
    bound: float | str | None,
    default: float,
    now: float | None = None,
    rel_to: float | None = None,
) -> float:
    """Resolve ONE time bound independently of the other (so mixed
    numeric/string windows like ``(1000.0, "now")`` keep the numeric
    bound): None → ``default``; numeric → float as-is; ``'now'``/'' →
    now; ``'N units ago'`` → ``rel_to - span`` (rel_to defaults to now);
    anything else → lenient datetime parse, truncated to the second."""
    now_s = float(int(now if now is not None else datetime.now(timezone.utc).timestamp()))
    if bound is None:
        return float(default)
    if isinstance(bound, (int, float)):
        return float(bound)
    s = bound.strip()
    if s in ("", "now"):
        return now_s
    m = _AGO_RE.match(s)
    if m:
        span = float(m.group(1)) * _UNITS[m.group(2).lower()]
        return float(rel_to if rel_to is not None else now_s) - span
    return float(int(time_str2sec(s, now_s)))


def parse_times(date1: str | None, date2: str | None, now: float | None = None) -> tuple[float, float]:
    """C10 — relative window parsing: when date2 is 'now' (or None),
    date1 is 'N minutes/hours/days/weeks/years [ago]' (default 1 week —
    including for UNRECOGNIZED date1, matching the executed reference's
    silent fallback, web_utils.py:66-78); otherwise both are absolute
    datetimes. '_' separators accepted ('3_weeks', web_utils.py:68).
    Returns (t0, t1) epoch seconds truncated to the second
    (ref epicsarchiver/web_utils.py:31-90). Engine extensions over the
    reference: an optional 'ago' suffix (the reference raises on it) and
    a 'month' unit (the reference falls back to 1 week)."""
    now_s = float(int(now if now is not None else datetime.now(timezone.utc).timestamp()))
    if date2 in (None, "", "now") :
        if not date1:
            return now_s - _UNITS["week"], now_s
        date1 = date1.replace("_", " ")
        m = _AGO_RE.match(date1)
        if m:
            span = float(m.group(1)) * _UNITS[m.group(2).lower()]
            return now_s - span, now_s
        try:
            return float(int(time_str2sec(date1, now_s))), now_s
        except (ValueError, TypeError):
            return now_s - _UNITS["week"], now_s  # ref default for junk
    t0 = float(int(time_str2sec(date1, now_s))) if date1 else now_s - _UNITS["week"]
    t1 = float(int(time_str2sec(date2, now_s)))
    if t1 < t0:
        t0, t1 = t1, t0
    return t0, min(t1, MAX_EPOCH)
