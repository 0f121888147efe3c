#!/usr/bin/env python
"""Regenerate the rolling-certification front list (VERDICT r8 task 1).

The driver certifies the FIRST 50 keys of queries() each round. This
tool computes what the next round's front should be:

  1. keys in queries() never seen in any CORRECTNESS_r*.json (new this
     round — certify in the round they land), alphabetical;
  2. then keys whose most recent GREEN driver row (rows+schema+hash all
     true) is OLDEST, oldest round first (alphabetical within a round),
     until the window is full.

Run it at the start of each round and paste the emitted list over
``_R{N}_FRONT`` in __spark_entry__.py. Keys with a red row in their
latest appearance sort ahead of everything green (they need re-proof).

Usage: python tools/rotate_front.py [--window 50] [--write]
  --write rewrites the _R*_FRONT list in __spark_entry__.py in place
  (the list must keep its current single-list shape).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def driver_history(
    correctness_files: list[str],
) -> tuple[dict[str, int], dict[str, tuple[int, bool]]]:
    """(key -> latest fully-green round, key -> (latest round seen, was
    that latest row green)). Tracking the LATEST row separately is what
    gives a since-regressed key (old green, newest row red) re-proof
    priority instead of letting it hide behind its stale green round
    (r9 ADVICE)."""
    green: dict[str, int] = {}
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(correctness_files):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for key, row in rows.items():
            ok = (
                isinstance(row, dict)
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and bool(row.get("hash_match"))
            )
            if ok:
                green[key] = max(green.get(key, 0), rnd)
            if key not in latest or rnd >= latest[key][0]:
                latest[key] = (rnd, ok)
    return green, latest


def compute_front(window: int = 50) -> list[str]:
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries())
    green, latest = driver_history(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    never = sorted(k for k in keys if k not in green)
    regressed = sorted(
        k for k in keys if k in green and k in latest and not latest[k][1]
    )
    need_proof = never + [k for k in regressed if k not in never]
    rest = sorted((green[k], k) for k in keys if k in green and k not in regressed)
    front = need_proof + [k for _rnd, k in rest]
    return front[:window]


def rewrite_entry(front: list[str]) -> None:
    path = os.path.join(REPO, "__spark_entry__.py")
    src = open(path).read()
    m = re.search(r"(_R\d+_FRONT: list\[str\] = \[)(.*?)(\n\])", src, re.S)
    if not m:
        raise SystemExit("no _R*_FRONT list found in __spark_entry__.py")
    body = "\n" + "\n".join(f'    "{k}",' for k in front)
    open(path, "w").write(src[: m.start(2)] + body + src[m.end(2) :])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    front = compute_front(args.window)
    print(json.dumps(front, indent=1))
    if args.write:
        rewrite_entry(front)
        print(f"rewrote _R*_FRONT ({len(front)} keys)", file=sys.stderr)


if __name__ == "__main__":
    main()
