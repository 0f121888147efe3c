"""Daemon lifecycle for the ``--follow`` streaming commands — the
engine's ``pvarch arch stop/restart`` / ``pvarch cache stop/restart``
analog (ref epicsarchiver/pvarch.py:196-248).

The reference signals a running mainloop through a DB control plane
(``cache.set_info(process='archive', status='stopping')``) that the
loop polls between rounds. The engine's daemons are Structured
Streaming queries, so the control plane is two small files in the
daemon's CHECKPOINT directory:

- ``pvarch_<proc>.pid``   — written at daemon start (pid + host),
  cleared on exit; doubles as the "already running?" guard the
  reference implements via recent-activity heuristics
  (pvarch.py:185-193).
- ``pvarch_<proc>.stop``  — the stop request. ``pvarch stop`` creates
  it; the daemon's watch loop polls it between awaitTermination
  slices and stops the query gracefully (checkpoint intact, so the
  next start resumes exactly-once).

The checkpoint dir is the right home because on a real cluster it
already lives on shared storage (HDFS/S3 via the Hadoop FS the
checkpoint uses) — ``pvarch stop`` works from any node, matching the
reference's DB-flag semantics rather than a host-local kill. SIGTERM
of the pid is only the local-fallback path in :func:`stop_daemon`.
"""

from __future__ import annotations

import os
import socket
import time


def pidfile(checkpoint: str, proc: str) -> str:
    return os.path.join(checkpoint, f"pvarch_{proc}.pid")


def sentinel(checkpoint: str, proc: str) -> str:
    return os.path.join(checkpoint, f"pvarch_{proc}.stop")


def read_pid_host(checkpoint: str, proc: str) -> tuple[int, str | None] | None:
    """(pid, hostname) from the pidfile; hostname is None for legacy
    pid-only files. The hostname decides whether the pid is checkable:
    on shared checkpoint storage a pid written by host A is meaningless
    in host B's process table."""
    try:
        with open(pidfile(checkpoint, proc)) as fh:
            parts = fh.readline().split()
            return int(parts[0]), (parts[1] if len(parts) > 1 else None)
    except (OSError, ValueError, IndexError):
        return None


def read_pid(checkpoint: str, proc: str) -> int | None:
    entry = read_pid_host(checkpoint, proc)
    return entry[0] if entry else None


def _is_local(host: str | None) -> bool:
    return host is None or host == socket.gethostname()


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def already_running(checkpoint: str, proc: str) -> int | None:
    """The duplicate-start guard: pid from a live pidfile, else None.
    A stale LOCAL pidfile (process gone on this host) is cleaned up
    here so a crashed daemon never blocks the next start. A pidfile
    written by ANOTHER host is trusted as-is — its pid cannot be
    checked against the local process table (an unrelated local
    process could share the number), so liveness there is decided
    only by the sentinel + pidfile-clear handshake."""
    entry = read_pid_host(checkpoint, proc)
    if entry is None:
        return None
    pid, host = entry
    if not _is_local(host):
        return pid
    if pid_alive(pid):
        return pid
    try:
        os.remove(pidfile(checkpoint, proc))
    except OSError:
        pass
    return None


def write_pidfile(checkpoint: str, proc: str) -> str:
    os.makedirs(checkpoint, exist_ok=True)
    path = pidfile(checkpoint, proc)
    with open(path, "w") as fh:
        fh.write(f"{os.getpid()} {socket.gethostname()}\n")
    return path


def request_stop(checkpoint: str, proc: str) -> str:
    os.makedirs(checkpoint, exist_ok=True)
    path = sentinel(checkpoint, proc)
    with open(path, "w") as fh:
        fh.write(f"stop requested by pid {os.getpid()}\n")
    return path


def stop_requested(checkpoint: str, proc: str) -> bool:
    return os.path.exists(sentinel(checkpoint, proc))


def clear(checkpoint: str, proc: str) -> None:
    for path in (pidfile(checkpoint, proc), sentinel(checkpoint, proc)):
        try:
            os.remove(path)
        except OSError:
            pass


def watch(q, checkpoint: str, proc: str, poll_s: float = 1.0) -> None:
    """Run a started streaming query as a managed daemon: write the
    pidfile, await termination in ``poll_s`` slices polling the stop
    sentinel, stop the query gracefully when asked, and always clear
    the control files on the way out. Query exceptions re-raise (the
    final awaitTermination surfaces them) after cleanup."""
    write_pidfile(checkpoint, proc)
    try:
        while q.isActive:
            if stop_requested(checkpoint, proc):
                q.stop()
                break
            q.awaitTermination(poll_s)
        q.awaitTermination()
    finally:
        clear(checkpoint, proc)


def stop_daemon(checkpoint: str, proc: str, timeout: float = 60.0) -> bool:
    """``pvarch stop``: write the sentinel, wait for the daemon to
    clear its pidfile (the graceful path). If the pidfile's host is
    THIS host and the pid is still alive at half the timeout, escalate
    to SIGTERM — the reference's kill-the-mainloop fallback. A pid
    recorded by another node is never signalled (it would hit an
    unrelated local process); for foreign hosts the sentinel +
    pidfile-clear handshake is the only stop path. True = stopped (or
    nothing was running)."""
    import signal

    entry = read_pid_host(checkpoint, proc)
    pid = already_running(checkpoint, proc)
    local = entry is not None and _is_local(entry[1])
    request_stop(checkpoint, proc)
    if pid is None:
        # nothing alive — leave no stale sentinel to kill the NEXT start
        clear(checkpoint, proc)
        return True
    deadline = time.monotonic() + timeout
    escalated = False
    while time.monotonic() < deadline:
        if read_pid(checkpoint, proc) is None or (local and not pid_alive(pid)):
            clear(checkpoint, proc)
            return True
        if local and not escalated and time.monotonic() > deadline - timeout / 2:
            try:
                os.kill(pid, signal.SIGTERM)
            except OSError:
                pass
            escalated = True
        time.sleep(0.2)
    return False
