"""Summarize a Spark event log: wall time per job (with its
setJobDescription label) and the heaviest stages.  The headless
substitute for the UI's Jobs/Stages pages (guide §7.1).

Usage:  python tools/joblog.py [path-to-eventlog | dir]  [--stages N]
With a directory, picks the newest file.
"""

from __future__ import annotations

import json
import os
import sys


def newest(path: str) -> str:
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in os.listdir(path)
                 if not f.startswith(".")]
        return max(files, key=os.path.getmtime)
    return path


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_stages = 15
    for a in sys.argv[1:]:
        if a.startswith("--stages"):
            n_stages = int(a.split("=", 1)[1])
    path = newest(args[0] if args else "/tmp/spark-events")

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    task_agg: dict[int, dict] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"]
                               for s in ev.get("Stage Infos", [])],
                }
            elif k == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j:
                    j["t1"] = ev["Completion Time"]
            elif k == "SparkListenerTaskEnd":
                tm = ev.get("Task Metrics") or {}
                sid = ev["Stage ID"]
                agg = task_agg.setdefault(
                    sid, {"run": 0, "deser": 0, "gc": 0, "n": 0})
                agg["run"] += tm.get("Executor Run Time", 0)
                agg["deser"] += tm.get("Executor Deserialize Time", 0)
                agg["gc"] += tm.get("JVM GC Time", 0)
                agg["n"] += 1
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stages[si["Stage ID"]] = {
                    "name": (si.get("Stage Name")
                             or (si.get("Details") or "").split("\n")[0]),
                    "ms": (t1 - t0) if t0 and t1 else 0,
                    "tasks": si.get("Number of Tasks", 0),
                }

    print(f"== {os.path.basename(path)} ==")
    print("-- jobs (submission order) --")
    total = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        ms = j.get("t1", j["t0"]) - j["t0"]
        total += ms
        st = ",".join(str(s) for s in j["stages"])
        print(f"job {jid:3d}  {ms:7d} ms  stages[{st:>12s}]  {j['desc'][:70]}")
    print(f"total job ms: {total}")
    print(f"-- top {n_stages} stages --")
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["ms"])[:n_stages]:
        ta = task_agg.get(sid, {})
        print(f"stage {sid:3d}  {s['ms']:7d} ms  {s['tasks']:4d} tasks  "
              f"run={ta.get('run', 0):6d} deser={ta.get('deser', 0):5d} "
              f"gc={ta.get('gc', 0):5d}  {s['name'][:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
