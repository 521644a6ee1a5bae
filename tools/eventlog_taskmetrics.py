#!/usr/bin/env python3
"""Aggregate Spark task metrics over a timed window of an event log.

Usage: eventlog_taskmetrics.py <events_file.zstd> [cut_seconds]

Sums executor run/CPU/GC/deserialize/shuffle-write/fetch-wait time and
input/shuffle/spill bytes across all tasks launched >= cut_seconds after
application start (cut excludes the untimed warm-up pass of a
ScalingBench leg). Used with eventlog_decompose.py to attribute an
N->4N efficiency shortfall: if inter-job gaps are small and parallelism
is high but run/CPU time inflates with thread count on identical input,
the term is per-task memory-subsystem contention (see tools/roofline),
not fixed cost or stragglers.
"""
import json, subprocess, sys

def main():
    path = sys.argv[1]
    cut = (float(sys.argv[2]) if len(sys.argv) > 2 else 0.0) * 1000.0
    out = subprocess.run(["zstd", "-dc", path], capture_output=True, check=True)
    t0 = None
    agg = {}
    n = 0
    for line in out.stdout.splitlines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            t0 = ev["Timestamp"]
        elif e == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            if t0 is None or ti.get("Launch Time", 0) - t0 < cut:
                continue
            m = ev.get("Task Metrics") or {}
            n += 1
            agg["run_ms"] = agg.get("run_ms", 0) + m.get("Executor Run Time", 0)
            agg["cpu_ms"] = agg.get("cpu_ms", 0) + m.get("Executor CPU Time", 0) / 1e6
            agg["gc_ms"] = agg.get("gc_ms", 0) + m.get("JVM GC Time", 0)
            agg["deser_ms"] = agg.get("deser_ms", 0) + m.get("Executor Deserialize Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            agg["shufw_ms"] = agg.get("shufw_ms", 0) + sw.get("Shuffle Write Time", 0) / 1e6
            sr = m.get("Shuffle Read Metrics") or {}
            agg["fetch_ms"] = agg.get("fetch_ms", 0) + sr.get("Fetch Wait Time", 0)
            agg["shufr_b"] = agg.get("shufr_b", 0) + sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
            inm = m.get("Input Metrics") or {}
            agg["input_b"] = agg.get("input_b", 0) + inm.get("Bytes Read", 0)
            agg["spill_b"] = agg.get("spill_b", 0) + m.get("Memory Bytes Spilled", 0)
    print(f"tasks={n}  (window: launch >= {cut/1000:.0f}s after app start)")
    for k in ["run_ms", "cpu_ms", "gc_ms", "deser_ms", "shufw_ms", "fetch_ms"]:
        print(f"  {k:9s} {agg.get(k, 0) / 1000.0:10.1f} s")
    for k in ["input_b", "shufr_b", "spill_b"]:
        print(f"  {k:9s} {agg.get(k, 0) / 1e9:10.2f} GB")

if __name__ == "__main__":
    main()
