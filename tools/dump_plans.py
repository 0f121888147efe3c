#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
Dumps ALL bench HEADLINE queries when no names are given. Plans are
captured without executing the query (logical->physical planning only),
so this is cheap enough to run before and after every optimization.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    import bench
    import __spark_entry__ as entrymod
    from epicsarchiver_spark.session import get_spark

    spark = get_spark("epicsarchiver-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qs]

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in the file
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
