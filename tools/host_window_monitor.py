#!/usr/bin/env python3
"""Sample host-noise indicators during a bench window.

The sf0.1 per-operator bench and the scaling legs both showed cross-window
swings (BENCH/BASELINE.md section 2 variance caveat: identical commit 31.0 s
vs 53.8 s; c2@4M checkpoint 435-598 s across four windows) that dwarf the
quantity under test. This samples /proc/stat and /proc/diskstats every
--interval seconds and prints a one-line JSON summary at SIGINT/SIGTERM or
after --duration, so every published window can carry its own noise
fingerprint:

  steal_pct   hypervisor steal (other tenants on the KVM host)
  iowait_pct  time runnable work waited on the one virtual disk
  busy_pct    non-idle share of all 32 host CPUs (how loaded WE kept the box)
  disk_rd_mb / disk_wr_mb  device-level traffic (page-cache misses + flushes)

Usage: python3 tools/host_window_monitor.py out.json [--interval 10]
       ... run the bench ...; kill -TERM <pid>  (or let --duration expire)
"""
import json, signal, sys, time

def cpu_times():
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                v = [int(x) for x in line.split()[1:]]
                # user nice system idle iowait irq softirq steal
                v += [0] * (8 - len(v))
                return v[:8]

import re
_NVME_PART = re.compile(r"^nvme\d+n\d+p\d+$")

def disk_sectors():
    rd = wr = 0
    with open("/proc/diskstats") as f:
        for line in f:
            p = line.split()
            # whole devices only (vda, sda, nvme0n1) — skip partitions, incl.
            # nvme0n1p1 (previously summed alongside its whole device,
            # double-counting NVMe traffic)
            if p[2].rstrip("0123456789") in ("vd", "sd") and p[2][-1].isdigit():
                continue
            if _NVME_PART.match(p[2]):
                continue
            if p[2].startswith(("vd", "sd", "nvme")):
                rd += int(p[5]); wr += int(p[9])
    return rd, wr

def main():
    out = sys.argv[1]
    interval = 10.0
    duration = None
    args = sys.argv[2:]
    for i, a in enumerate(args):
        if a == "--interval": interval = float(args[i + 1])
        if a == "--duration": duration = float(args[i + 1])

    t0, c0, d0 = time.time(), cpu_times(), disk_sectors()
    samples = []
    stop = {"flag": False}
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.update(flag=True))

    prev_t, prev_c = t0, c0
    while not stop["flag"] and (duration is None or time.time() - t0 < duration):
        time.sleep(interval)
        t, c = time.time(), cpu_times()
        dt = [b - a for a, b in zip(prev_c, c)]
        tot = sum(dt) or 1
        samples.append({
            "t": round(t - t0, 1),
            "steal_pct": round(100.0 * dt[7] / tot, 2),
            "iowait_pct": round(100.0 * dt[4] / tot, 2),
            "busy_pct": round(100.0 * (tot - dt[3] - dt[4]) / tot, 2),
        })
        prev_t, prev_c = t, c

    t1, c1, d1 = time.time(), cpu_times(), disk_sectors()
    dt = [b - a for a, b in zip(c0, c1)]
    tot = sum(dt) or 1
    summary = {
        "window_sec": round(t1 - t0, 1),
        "steal_pct": round(100.0 * dt[7] / tot, 2),
        "iowait_pct": round(100.0 * dt[4] / tot, 2),
        "busy_pct": round(100.0 * (tot - dt[3] - dt[4]) / tot, 2),
        "steal_pct_max_sample": max((s["steal_pct"] for s in samples), default=0.0),
        "disk_rd_mb": round((d1[0] - d0[0]) * 512 / 1e6, 1),
        "disk_wr_mb": round((d1[1] - d0[1]) * 512 / 1e6, 1),
        "n_samples": len(samples),
    }
    with open(out, "w") as f:
        json.dump({"summary": summary, "samples": samples}, f, indent=1)
    print(json.dumps(summary))

if __name__ == "__main__":
    main()
