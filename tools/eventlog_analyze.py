#!/usr/bin/env python3
"""Decompose a Spark event log into parallel task work vs driver-serial time.

Usage: python3 tools/eventlog_analyze.py <eventlog-file> [cores]

Reports, for the whole application and per job:
  - wall time covered by running jobs vs gaps between jobs (driver serial:
    planning, janino, action round-trips)
  - sum of task executorRunTime (the parallelizable work), its ratio to
    job wall * cores (occupancy), plus GC time and result serialization
  - the top stages by task time and by wall time

This is a measurement tool for the scaling analysis in BENCH/BASELINE.md;
it is not part of the library.
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    jobs = {}          # jobId -> [start, end]
    job_stages = {}    # jobId -> set of stage ids
    stages = defaultdict(lambda: {"task_ms": 0, "gc_ms": 0, "tasks": 0,
                                  "wall": [None, None], "name": ""})
    app = [None, None]

    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app[0] = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app[1] = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = [ev["Submission Time"], None]
                job_stages[ev["Job ID"]] = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]][1] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages[(si["Stage ID"], si["Stage Attempt ID"])]
                st["name"] = si["Stage Name"]
                st["wall"] = [si.get("Submission Time"), si.get("Completion Time")]
            elif e == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                st = stages[(ev["Stage ID"], ev["Stage Attempt ID"])]
                st["task_ms"] += m.get("Executor Run Time", 0)
                st["gc_ms"] += m.get("JVM GC Time", 0)
                st["tasks"] += 1

    jlist = sorted((j for j in jobs.values() if j[1]), key=lambda j: j[0])
    if not jlist:
        print("no completed jobs in log")
        return
    t0 = jlist[0][0]
    t1 = max(j[1] for j in jlist)
    wall = (t1 - t0) / 1e3

    # merge job intervals to find covered time vs gaps
    covered = 0
    cur_s, cur_e = jlist[0]
    for s, e in jlist[1:]:
        if s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
    covered += cur_e - cur_s
    gaps = (t1 - t0) - covered

    task_ms = sum(s["task_ms"] for s in stages.values())
    gc_ms = sum(s["gc_ms"] for s in stages.values())

    print(f"jobs: {len(jlist)}   wall(first-job-start..last-job-end): {wall:.1f} s")
    print(f"  job-covered: {covered/1e3:.1f} s   inter-job gaps (driver serial): {gaps/1e3:.1f} s")
    print(f"  sum task run time: {task_ms/1e3:.1f} s  (= {task_ms/1e3/cores:.1f} s at {cores} cores if perfectly packed)")
    print(f"  occupancy over covered time: {task_ms/ (covered*cores) *100:.1f}%")
    print(f"  sum GC time in tasks: {gc_ms/1e3:.1f} s")

    # per-job timeline with the gap since the previous job's end — the gap
    # column is the driver-serial time (planning, janino, action round-trip)
    print("\nper-job timeline (gap = idle driver time since previous job end):")
    prev_end = t0
    for jid in sorted(jobs):
        s, e = jobs[jid]
        if e is None:
            continue
        jtask = sum(stages[(sid, a)]["task_ms"] for (sid, a) in stages
                    if sid in job_stages.get(jid, []))
        print(f"  job {jid:>3} t+{(s-t0)/1e3:>7.1f}s dur={(e-s)/1e3:>7.1f}s gap={(s-prev_end)/1e3:>6.1f}s task={jtask/1e3:>8.1f}s")
        prev_end = max(prev_end, e)

    # within-job dead time: job wall*cores - task time (stragglers, barriers)
    print("\ntop 12 stages by task time:")
    top = sorted(stages.items(), key=lambda kv: -kv[1]["task_ms"])[:12]
    for (sid, att), st in top:
        sw = (st["wall"][1] - st["wall"][0]) / 1e3 if st["wall"][0] and st["wall"][1] else float("nan")
        occ = st["task_ms"] / (sw * 1e3 * cores) * 100 if sw == sw and sw > 0 else float("nan")
        name = st["name"][:60]
        print(f"  stage {sid:>4} tasks={st['tasks']:>4} task={st['task_ms']/1e3:>7.1f}s wall={sw:>6.1f}s occ={occ:>5.1f}% gc={st['gc_ms']/1e3:>5.1f}s  {name}")

    print("\ntop 12 stages by wall time:")
    topw = sorted((kv for kv in stages.items() if kv[1]["wall"][0] and kv[1]["wall"][1]),
                  key=lambda kv: -(kv[1]["wall"][1] - kv[1]["wall"][0]))[:12]
    for (sid, att), st in topw:
        sw = (st["wall"][1] - st["wall"][0]) / 1e3
        occ = st["task_ms"] / (sw * 1e3 * cores) * 100 if sw > 0 else float("nan")
        print(f"  stage {sid:>4} tasks={st['tasks']:>4} task={st['task_ms']/1e3:>7.1f}s wall={sw:>6.1f}s occ={occ:>5.1f}%  {st['name'][:60]}")


if __name__ == "__main__":
    main()
