#!/usr/bin/env python3
"""Count Spark jobs/stages/tasks per job description from an event log.

Usage: count_jobs.py <eventlog-file> [prefix-filter]

The bench labels every timed run `bench:<query>:<run>` (Bench.scala), so
grouping SparkListenerJobStart events by that property attributes driver
round-trips to queries — the evidence the r13 defer/lazy-checkpoint work
claims (fewer serialized driver actions per query, same results).
"""
import json, sys, collections

path = sys.argv[1]
pref = sys.argv[2] if len(sys.argv) > 2 else ""
jobs = collections.Counter()
stages = collections.Counter()
tasks = collections.Counter()
with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if e.get("Event") == "SparkListenerJobStart":
            desc = (e.get("Properties") or {}).get(
                "spark.job.description", "<unlabeled>")
            if pref and not desc.startswith(pref):
                continue
            jobs[desc] += 1
            sts = e.get("Stage Infos") or []
            stages[desc] += len(sts)
            tasks[desc] += sum(s.get("Number of Tasks", 0) for s in sts)
for d in sorted(jobs):
    print(f"{d}\tjobs={jobs[d]}\tstages={stages[d]}\ttasks={tasks[d]}")
