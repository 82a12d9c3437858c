"""Isolated A/B probe (SCALE.md codegen-measurement precedent).

Runs a named subset of the bench registry in a FRESH session with the
exact bench session config + settle discipline, N samples per query,
and prints one JSON line. Used round 13 to adjudicate the two
undeclared r12 regressions (json_field_profile x3.5,
frequent_histogram x2.9) whose code did not change: if the isolated
times match r11, the regression is session-state (run ordering /
cache pressure), not plan.

Usage: python tools/ab_probe.py q1 q2 ... [--runs=N] [--prefix=a,b,c]
[--control]
--prefix runs the named queries ONCE each, in order, with the bench
settle step, BEFORE timing the victims — reproduces the full-run
context so the debt source can be bisected.
--control (round 15, SCALE.md R15 §1) interleaves the frozen bench
control instrument (bench.control_point) before, between, and after
the victims, and reports each victim's median/control-median RATIO —
the unit family-level cross-round comparisons are adjudicated in,
since raw seconds confound plan changes with host-day drift.
"""
from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    prefix: list[str] = []
    with_control = "--control" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--prefix="):
            prefix = [p for p in a.split("=", 1)[1].split(",") if p]
    sys.path.insert(0, "/root/repo")
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    spark = bench.build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry, warm_state = bench.build_registry(spark, sf_dir)
    print(f"# warm_state: {warm_state}", file=sys.stderr)

    def _settle() -> None:
        try:
            jvm = spark.sparkContext._jvm
            jvm.System.gc()
            time.sleep(1.0)
            jvm.System.gc()
            time.sleep(0.5)
        except Exception:
            pass

    pre_times: dict[str, float] = {}
    for name in prefix:
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).collect()
        pre_times[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()
        _settle()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    control_samples: list[float] = []

    def _control() -> None:
        if with_control:
            control_samples.append(round(bench.control_point(spark, cpus), 4))

    if with_control:
        bench.control_once(spark, cpus)      # untimed warm
    _control()
    out: dict[str, list[float]] = {}
    for name in args:
        fn = registry[name]
        if not prefix:
            fn(spark, sf_dir).collect()  # untimed warm (plan/codegen/footers)
            spark.catalog.clearCache()
        ts: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _ = fn(spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        _settle()
        out[name] = ts
        _control()
    result = {
        "prefix_times": pre_times,
        "samples": out,
        "medians": {k: statistics.median(v) for k, v in out.items()},
        "mins": {k: min(v) for k, v in out.items()},
    }
    if with_control:
        cmed = statistics.median(control_samples)
        result["control_samples"] = control_samples
        result["control_median"] = round(cmed, 4)
        result["ratios_vs_control"] = {
            k: round(statistics.median(v) / cmed, 3)
            for k, v in out.items()
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
