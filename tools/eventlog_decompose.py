#!/usr/bin/env python3
"""Decompose a Spark event log into job wall-time vs driver gaps.

Usage: eventlog_decompose.py <events_file.zstd> [--jobs]

Prints total app span, sum of job spans, sum of inter-job gaps (driver-side
fixed cost: planning, collect-side model training, parquet commits, etc),
and with --jobs a per-job table (start-offset, duration, gap-before,
description) so the core-count-invariant term of a scaling pair can be
attributed to specific stages.
"""
import json, subprocess, sys

def load(path):
    out = subprocess.run(["zstd", "-dc", path], capture_output=True, check=True)
    for line in out.stdout.splitlines():
        try:
            yield json.loads(line)
        except json.JSONDecodeError:
            pass

def main():
    path = sys.argv[1]
    show_jobs = "--jobs" in sys.argv
    app_start = app_end = None
    jobs = {}          # id -> [start, end, desc, stage_ids]
    stage_task = {}    # stage id -> [task_time_ms, n_tasks, max_task_ms]
    for ev in load(path):
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerJobStart":
            desc = ev.get("Properties", {}).get("spark.job.description", "") or \
                   ev.get("Properties", {}).get("callSite.short", "")
            jobs[ev["Job ID"]] = [ev["Submission Time"], None, desc[:70],
                                  ev.get("Stage IDs", [])]
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]][1] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            st = stage_task.setdefault(ev["Stage ID"], [0, 0, 0])
            st[0] += dur; st[1] += 1; st[2] = max(st[2], dur)

    ordered = sorted((v for v in jobs.values() if v[1]), key=lambda v: v[0])
    if not ordered:
        print("no completed jobs"); return
    t0 = app_start or ordered[0][0]
    tN = app_end or ordered[-1][1]
    job_sum = sum(e - s for s, e, *_ in ordered) / 1000.0
    # gaps: time not covered by any job interval (merge overlaps)
    merged = []
    for s, e, *_ in ordered:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    covered = sum(e - s for s, e in merged) / 1000.0
    span = (tN - t0) / 1000.0
    head_gap = (ordered[0][0] - t0) / 1000.0
    tail_gap = (tN - merged[-1][1]) / 1000.0
    inner_gap = span - covered - head_gap - tail_gap
    print(f"app span            {span:9.1f} s")
    print(f"job-covered time    {covered:9.1f} s   (sum of job spans {job_sum:.1f} s)")
    print(f"gap before 1st job  {head_gap:9.1f} s")
    print(f"inter-job gaps      {inner_gap:9.1f} s")
    print(f"gap after last job  {tail_gap:9.1f} s")
    if show_jobs:
        print(f"\n{'off(s)':>7} {'dur(s)':>7} {'gap(s)':>6} {'task(s)':>8} "
              f"{'ntask':>5} {'maxt(s)':>7} {'par':>5}  description")
        prev_end = t0
        for s, e, d, sids in ordered:
            gap = (s - prev_end) / 1000.0
            tt = sum(stage_task.get(i, [0, 0, 0])[0] for i in sids) / 1000.0
            nt = sum(stage_task.get(i, [0, 0, 0])[1] for i in sids)
            mx = max((stage_task.get(i, [0, 0, 0])[2] for i in sids), default=0) / 1000.0
            par = tt / ((e - s) / 1000.0) if e > s else 0
            print(f"{(s-t0)/1000.0:7.1f} {(e-s)/1000.0:7.1f} {max(gap,0):6.2f} "
                  f"{tt:8.1f} {nt:5d} {mx:7.1f} {par:5.2f}  {d}")
            prev_end = max(prev_end, e)

if __name__ == "__main__":
    main()
