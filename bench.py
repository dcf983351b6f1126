#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "wall_sec_total", "value": N, "unit": "sec",
   "queries": {"q01": sec, ...}, "sf": 0.1}

Each query is timed as build-plan + execute-to-count (a real action that
materializes the full result without driver-side collect overhead for
wide rows). A warmup query first pays JVM/codegen startup so per-query
numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    if not os.path.isdir(sf_dir):
        print(json.dumps({"error": f"sf dir not found: {sf_dir}"}))
        sys.exit(2)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_session(app_name="airflow_spark-bench", cpus=cpus,
                        shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()

    # Warmup: pay session/codegen startup once, outside the timings.
    qs["q01"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "wall_sec_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
