"""Split per-query bench time into BUILD (registry fn call: driver-side
plan construction, py4j chatter, any eager sub-jobs the twin runs while
building) vs COLLECT (the terminal action), in the exact bench session
config. Optimization round 16, guide §1: several twins run eager
sub-jobs or heavy plan construction inside the timed region; this
attributes it.

Usage: python tools/build_probe.py q1 q2 ... [--runs=N]
Prints one JSON line per query: {"query":..., "build": [...], "collect": [...]}
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sys.path.insert(0, "/root/repo")
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    spark = bench.build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry, warm_state = bench.build_registry(spark, sf_dir)
    print(f"# warm_state: {warm_state}", file=sys.stderr)

    for name in args:
        fn = registry[name]
        builds, collects = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            rows = df.collect()
            t2 = time.perf_counter()
            _ = len(rows)
            builds.append(round(t1 - t0, 4))
            collects.append(round(t2 - t1, 4))
            spark.catalog.clearCache()
        print(json.dumps({
            "query": name, "build": builds, "collect": collects,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
