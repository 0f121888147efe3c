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


def last_green_round(correctness_files: list[str]) -> dict[str, int]:
    """key -> latest round with a fully-green driver row."""
    out: dict[str, int] = {}
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
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out[key] = max(out.get(key, 0), rnd)
    return out


def compute_front(window: int = 50) -> list[str]:
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries())
    green = last_green_round(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    never = sorted(k for k in keys if k not in green)
    stale = sorted((green[k], k) for k in keys if k in green)
    front = never + [k for _rnd, k in stale]
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
