"""Alert mail template substitution — C17/C18 (SURVEY §2.8).

Driver-side string templating over a latest-value lookup table: the
engine emits notification *records* (streaming/alerts.py); rendering the
message body is an edge concern done here. Behavioral spec from
epicsarchiver/cache.py:662-690 (templates %PV%, %VALUE%, %LABEL%,
%COMP%, %TRIP%, and %PV(other)% point lookups, ≤25 per message) and
util.py:317-322 (stored-escape cleanup)."""

from __future__ import annotations

import re

MAX_PV_LOOKUPS = 25

_PV_RE = re.compile(r"%PV\(([^)]+)\)%")


def clean_mail_message(msg: str) -> str:
    """C18 — unescape stored '\\n'/'\\r' and quote escapes."""
    return (
        msg.replace("\\r", "\r")
        .replace("\\n", "\n")
        .replace("\\'", "'")
        .replace('\\"', '"')
    )


def render_alert_mail(
    template: str,
    pvname: str,
    value,
    label: str,
    compare: str,
    trippoint,
    lookup: dict[str, str] | None = None,
) -> str:
    """C17 — substitute the standard fields plus %PV(name)% lookups
    against the latest-value cache (dict collected from the cache table's
    tiny frame)."""
    out = clean_mail_message(template)
    out = (
        out.replace("%PV%", str(pvname))
        .replace("%VALUE%", str(value))
        .replace("%LABEL%", str(label))
        .replace("%COMP%", str(compare))
        .replace("%TRIP%", str(trippoint))
    )
    lookup = lookup or {}
    n = 0

    def sub(m: re.Match) -> str:
        nonlocal n
        n += 1
        if n > MAX_PV_LOOKUPS:
            return m.group(0)
        return str(lookup.get(m.group(1), f"(unknown PV {m.group(1)})"))

    return _PV_RE.sub(sub, out)
