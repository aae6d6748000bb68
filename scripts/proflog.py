#!/usr/bin/env python3
"""Parse a Spark event log into per-query / per-job attribution.

Dev measurement tool for optimization rounds (guide §1): run a main
with JAVA_TOOL_OPTIONS="-Dspark.eventLog.enabled=true
-Dspark.eventLog.dir=file:///tmp/sparklogs" and feed the app file here.

Prints, per SQL execution (= one action): duration, sum of job wall
time inside it, task count, task time sum — and the gap (driver-side
planning/scheduling time not covered by any job). Then a whole-app
summary: total wall, job-covered wall, task counts, top stages.
"""
import json, sys, os, glob
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else max(
    glob.glob("/tmp/sparklogs/*"), key=os.path.getmtime)

execs = {}          # execId -> dict(desc, start, end)
jobs = {}           # jobId -> dict(start, end, execId, desc, ntasks, tasktime)
stage2job = {}
cur_desc = {}
for line in open(path, errors="replace"):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event", "")
    if ev.endswith("SQLExecutionStart"):
        execs[e["executionId"]] = dict(
            desc=e.get("description", "")[:110], start=e["time"], end=None)
    elif ev.endswith("SQLExecutionEnd"):
        if e["executionId"] in execs:
            execs[e["executionId"]]["end"] = e["time"]
    elif ev == "SparkListenerJobStart":
        props = e.get("Properties", {}) or {}
        eid = props.get("spark.sql.execution.id")
        jobs[e["Job ID"]] = dict(
            start=e["Submission Time"], end=None,
            execId=int(eid) if eid is not None else None,
            desc=(props.get("spark.job.description") or "")[:110],
            ntasks=0, tasktime=0,
            stages=[s["Stage ID"] for s in e.get("Stage Infos", [])])
        for s in e.get("Stage Infos", []):
            stage2job[s["Stage ID"]] = e["Job ID"]
    elif ev == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["end"] = e["Completion Time"]
    elif ev == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        j = stage2job.get(sid)
        if j in jobs:
            jobs[j]["ntasks"] += 1
            info = e.get("Task Info", {})
            jobs[j]["tasktime"] += info.get("Finish Time", 0) - info.get("Launch Time", 0)

by_exec = defaultdict(list)
for jid, j in jobs.items():
    by_exec[j["execId"]].append(j)

print(f"{'execId':>6} {'wall_s':>8} {'jobs_s':>8} {'gap_s':>7} {'njobs':>5} "
      f"{'ntask':>6} {'taskt_s':>8}  desc")
tot_wall = tot_jobs = tot_gap = 0.0
for eid in sorted(k for k in execs if execs[k]["end"]):
    ex = execs[eid]
    wall = (ex["end"] - ex["start"]) / 1e3
    js = by_exec.get(eid, [])
    # job-covered wall: merge job intervals (jobs can overlap)
    ivs = sorted((j["start"], j["end"]) for j in js if j["end"])
    covered = 0
    lo = hi = None
    for s0, e0 in ivs:
        if lo is None:
            lo, hi = s0, e0
        elif s0 <= hi:
            hi = max(hi, e0)
        else:
            covered += hi - lo
            lo, hi = s0, e0
    if lo is not None:
        covered += hi - lo
    jsec = covered / 1e3
    ntasks = sum(j["ntasks"] for j in js)
    tt = sum(j["tasktime"] for j in js) / 1e3
    gap = wall - jsec
    tot_wall += wall; tot_jobs += jsec; tot_gap += gap
    print(f"{eid:>6} {wall:8.2f} {jsec:8.2f} {gap:7.2f} {len(js):>5} "
          f"{ntasks:>6} {tt:8.2f}  {ex['desc']}")
print(f"\nTOTALS wall={tot_wall:.1f}s job-covered={tot_jobs:.1f}s "
      f"driver-gap={tot_gap:.1f}s nexec={len(execs)} njobs={len(jobs)} "
      f"ntasks={sum(j['ntasks'] for j in jobs.values())}")
# jobs not tied to any SQL execution (RDD actions e.g. localCheckpoint)
loose = by_exec.get(None, [])
if loose:
    lsec = sum((j["end"] - j["start"]) / 1e3 for j in loose if j["end"])
    print(f"non-SQL jobs: n={len(loose)} wall-sum={lsec:.1f}s "
          f"ntasks={sum(j['ntasks'] for j in loose)}")
