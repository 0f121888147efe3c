#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "ts_range_read",
    "ts_get_data",
    "ts_value_at",
    "ts_latest",
    "ts_minmax",
    "ts_cull_band",
    "ts_deadband",
    "ts_locf_grid",
    "ts_heartbeat_fill",
    "ts_status_activity",
    "ts_enum_labels",
    "rel_score_sums",
    "rel_orders_no_lineitem",
    "emb_pairwise_topk",
    "rel_pair_scores",
    "rel_related_topk",
    "rel_pricing_summary",
    "rel_top_orders",
    "rel_regional_revenue",
    "rel_order_priority",
    "doc_fingerprints",
    "doc_quality",
    "doc_langid",
    "doc_minhash_neardups",
    "doc_simhash_neardups",
    "emb_topk_cosine",
    "emb_topk_lsh",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from epicsarchiver_spark.session import get_spark

    spark = get_spark("epicsarchiver-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM + parquet footers so timings measure the queries
    qs["ts_range_read"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
