"""Benchmark harness: runs the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect), mirroring how the plan would execute against a
real sink at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from broadway_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("broadway-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footer caches once with the cheapest query
    # so per-query numbers measure the plan, not JIT warmup.
    qs["s1_scan"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two passes per query, report the min: this host shows up to 4×
    # wall-clock variance (VM) and first execution pays one-time codegen
    # compile — min-of-2 approximates steady-state per-plan cost.
    total0 = time.time()
    for name, fn in qs.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
