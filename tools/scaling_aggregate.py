#!/usr/bin/env python3
"""Combine per-leg ScalingBench outputs (one JSON-lines file per fresh-JVM
leg, cascade_time records per mode) into the round's scaling summary:
per-mode times/throughput at every level plus every N->4N pair efficiency.

Usage: scaling_aggregate.py out.json leg1.json [leg2.json ...]
"""
import json
import sys


def main():
    out_path, legs = sys.argv[1], sys.argv[2:]
    recs = []
    for p in legs:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    recs.append(json.loads(line))
    times = {}   # (mode, cores) -> best time
    ndocs = None
    extra = []
    for r in recs:
        if r.get("metric") == "cascade_time":
            times[(r["mode"], r["cores"])] = r["value"]
            ndocs = r["n_docs"]
        else:
            extra.append(r)
    summary = {"n_docs": ndocs, "modes": {}, "pairs": [], "other": extra}
    for (mode, cores), t in sorted(times.items()):
        summary["modes"].setdefault(mode, {})[str(cores)] = {
            "t_sec": t, "docs_per_sec": round(ndocs / t, 1)}
    for (mode, c), t in sorted(times.items()):
        if (mode, 4 * c) in times:
            t4 = times[(mode, 4 * c)]
            summary["pairs"].append({
                "mode": mode, "cores_n": c, "cores_4n": 4 * c,
                "t_n_sec": t, "t_4n_sec": t4,
                "speedup": round(t / t4, 3),
                "efficiency": round(t / t4 / 4.0, 4),
                "gate_met": t / t4 / 4.0 >= 0.8})
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
