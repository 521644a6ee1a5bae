#!/usr/bin/env python3
"""Assemble per-leg ScalingBench outputs into one scaling-matrix artifact.

Each leg file (BENCH/<tag>_c<cores>_<mode>.json) holds one cascade_time
JSON line; this script groups them by mode, emits every N->4N pair found
(cores_4n == 4 * cores_n), and computes efficiency = (t_N / t_4N) / 4
against the >=0.8 gate. Shape matches BENCH/scaling_r4_4m_final.json so
round-over-round artifacts diff cleanly.

Usage: python3 tools/assemble_scaling.py OUT.json LEG.json [LEG.json ...]
"""
import json
import sys


def main() -> None:
    out, legs = sys.argv[1], sys.argv[2:]
    modes: dict = {}
    n_docs = None
    other = []
    for path in legs:
        with open(path) as f:
            for line in f.read().splitlines():
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("metric") == "cascade_time":
                    n_docs = rec["n_docs"]
                    modes.setdefault(rec["mode"], {})[str(rec["cores"])] = {
                        "t_sec": rec["value"],
                        "docs_per_sec": rec["docs_per_sec"],
                    }
                else:
                    other.append(rec)
    pairs = []
    for mode, by_cores in modes.items():
        cores = sorted(int(c) for c in by_cores)
        for n in cores:
            if 4 * n in cores:
                t_n = by_cores[str(n)]["t_sec"]
                t_4n = by_cores[str(4 * n)]["t_sec"]
                eff = (t_n / t_4n) / 4.0
                pairs.append({
                    "mode": mode, "cores_n": n, "cores_4n": 4 * n,
                    "t_n_sec": t_n, "t_4n_sec": t_4n,
                    "speedup": round(t_n / t_4n, 3),
                    "efficiency": round(eff, 4),
                    "gate_met": eff >= 0.8,
                })
    doc = {"n_docs": n_docs, "modes": modes, "pairs": pairs, "other": other}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    for p in pairs:
        print(f"{p['mode']} {p['cores_n']}->{p['cores_4n']}: "
              f"eff {p['efficiency']} gate_met={p['gate_met']}")


if __name__ == "__main__":
    main()
