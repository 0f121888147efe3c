"""Deployment configuration — the ``EPICSARCH_CONFIG`` TOML lane.

The reference boots every daemon from a TOML file pointed to by the
``EPICSARCH_CONFIG`` environment variable (ref epicsarchiver/util.py:68-77
``get_config``; ref config.toml ships store/cache/deadtime/alert-period
settings) and exposes a ``pvarch show_config`` verb (ref
pvarch.py:154-170). The engine's analog: one versioned TOML supplying
the deployment-shaped defaults — store path, runs/catalog/alerts
dimension paths, JDBC cache URL + dialect, deadtime/deadband defaults,
alert period — that every ``pvarch`` subcommand consults.

Precedence (resolved per key in ``pvarch``): explicit CLI flag >
config file (``--config PATH`` > ``$EPICSARCH_CONFIG``) > built-in
default. The engine has no MySQL credential block — storage is paths,
and the only connection string is the optional JDBC cache URL.
"""

from __future__ import annotations

import os

# key -> (built-in default, description shown by `pvarch show_config`)
CONFIG_KEYS: dict[str, tuple[object, str]] = {
    "store": ("./points", "points store path (--store)"),
    "runs_file": ("./runs.parquet", "runs dimension path (--runs-file)"),
    "cache": ("./cache", "latest-value cache parquet path (cache_daemon --cache)"),
    "jdbc_url": (None, "JDBC cache URL (cache_daemon --jdbc-url)"),
    "dialect": ("merge", "distributed JDBC upsert dialect: merge|mysql"),
    "deadtime": (5.0, "archive deadtime seconds (archive --deadtime)"),
    "deadband": (0.0, "archive deadband fraction (archive --deadband)"),
    "alert_period": (15.0, "alert sweep period seconds (alerts --period-s)"),
    "alerts_table": ("./alerts", "alert-rules dimension path (--table)"),
    "queue": ("./requests", "requests mailbox parquet path (--queue)"),
    "catalog": ("./pv_catalog", "pv catalog dimension path (--catalog)"),
}

ENVVAR = "EPICSARCH_CONFIG"

_NUMERIC = {"deadtime", "deadband", "alert_period"}


def load_config(path: str | None = None) -> tuple[dict, str | None]:
    """Read the deployment TOML: explicit ``path`` first, else
    ``$EPICSARCH_CONFIG``, else empty. Returns ``(values, source)``
    where ``source`` is the file actually read (None = defaults only).
    Unknown keys fail loudly — a typo'd key silently reverting to a
    built-in default is exactly the config bug a versioned file is
    supposed to prevent. Numeric keys are coerced (TOML ``5`` and
    ``5.0`` both mean 5.0 s)."""
    import tomllib

    src = path or os.environ.get(ENVVAR)
    if not src:
        return {}, None
    with open(src, "rb") as f:
        raw = tomllib.load(f)
    unknown = sorted(set(raw) - set(CONFIG_KEYS))
    if unknown:
        raise ValueError(
            f"unknown config key(s) {unknown} in {src} — "
            f"known: {sorted(CONFIG_KEYS)}"
        )
    for k in _NUMERIC & set(raw):
        raw[k] = float(raw[k])
    return raw, src


def resolve(key: str, flag_value, cfg: dict):
    """One key's effective value: flag if given, else config, else
    built-in default."""
    if flag_value is not None:
        return flag_value
    if key in cfg:
        return cfg[key]
    return CONFIG_KEYS[key][0]
