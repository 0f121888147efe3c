#!/usr/bin/env python
"""Targeted re-measure of a query subset with bench.py's exact
methodology (noop sink, N round-robin runs, median, clearCache between
queries). Usage: python tools/mini_bench.py q1 q2 ...
Prints one JSON line {name: median_sec}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entrymod
    from statistics import median

    from epicsarchiver_spark.session import get_spark

    spark = get_spark("epicsarchiver-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["ts_range_read"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    raw: dict[str, list[float]] = {}
    for _ in range(n_runs):
        for name in names:
            fn = qs.get(name)
            if fn is None:
                continue
            spark.sparkContext.setJobDescription(f"mini:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            raw.setdefault(name, []).append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    print(json.dumps({k: round(median(v), 4) for k, v in raw.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
