"""Round-14 optimization profiler (guide §1): run one or more declared
queries (production-twin path, same as bench.py) on a session with the
EVENT LOG enabled, then attribute wall time to Spark jobs — job id,
duration, description, stage task counts — so the optimization targets
the measured cost, not the guessed one.

Usage:
    python scripts/r15_profile.py x110 x111          # prefixes ok
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r15_profile.py x93
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from openapc_olap_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/r15_eventlog"


def _jobs_from_eventlog(app_dir: str) -> list[dict]:
    """Parse the single-app event log: one record per job with start/end
    and the job group/description properties."""
    # Spark 4 rolling event log: a directory per app holding events_* files
    entries = [os.path.join(app_dir, f) for f in os.listdir(app_dir)]
    entries.sort(key=os.path.getmtime)
    top = entries[-1]
    if os.path.isdir(top):
        cand = [os.path.join(top, f) for f in os.listdir(top)
                if f.startswith("events_")]
        cand.sort()
        paths = cand
    else:
        paths = [top]
    jobs: dict[int, dict] = {}
    execs: dict[int, dict] = {}
    import itertools
    lines = itertools.chain.from_iterable(open(p) for p in paths)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "id": ev["Job ID"],
                    "t0": ev["Submission Time"],
                    "exec": props.get("spark.sql.execution.root.id",
                                      props.get("spark.sql.execution.id")),
                    "stages": len(ev.get("Stage IDs", [])),
                    "tasks": sum(s.get("Number of Tasks", 0)
                                 for s in ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev["Completion Time"]
            elif e and e.endswith("SQLExecutionStart"):
                execs[ev["executionId"]] = {
                    "desc": ev.get("description", ""),
                    "t0": ev.get("time"),
                }
            elif e and e.endswith("SQLExecutionEnd"):
                x = execs.get(ev["executionId"])
                if x is not None:
                    x["t1"] = ev.get("time")
    for j in jobs.values():
        x = execs.get(int(j["exec"])) if j.get("exec") is not None else None
        j["desc"] = (x or {}).get("desc", "")
    return ([j for j in jobs.values() if "t1" in j],
            [dict(x, id=i) for i, x in execs.items() if "t1" in x])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import shutil
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(app_name="r15profile", master=f"local[{cpus}]",
                      extra_confs={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.dir": EVDIR,
                          "spark.eventLog.compress": "false",
                          "spark.eventLog.rolling.enabled": "false",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    from openapc_olap_spark import contrib_queries, etl_queries
    TWINS = {**contrib_queries.BENCH_TWINS, **etl_queries.BENCH_TWINS}
    wanted = sys.argv[1:]
    declared = [(n, TWINS.get(n, f)) for n, f in entrymod.queries().items()
                if any(n.startswith(w) for w in wanted)]
    for name, fn in declared:
        fn(spark, sf_dir).collect()                  # warm-up
        mark_ms = time.time() * 1000                 # epoch, matches log
        mark = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall = time.perf_counter() - mark
        print(f"\n=== {name}: wall {wall:.2f}s ===")
        jobs, execs = _jobs_from_eventlog(EVDIR)
        # streaming micro-batch jobs run on engine threads (no inherited
        # description), so attribute by TIME: executions started after mark
        timed = [x for x in execs if x["t0"] >= mark_ms - 50]
        tot = sum(x["t1"] - x["t0"] for x in timed) / 1000
        print(f"  {len(timed)} SQL executions, sum exec wall {tot:.2f}s "
              f"(overlap/driver gap: {wall - tot:+.2f}s)")
        for x in timed:
            njobs = [j for j in jobs if j.get("exec") is not None
                     and int(j["exec"]) == x["id"] and "t1" in j]
            tasks = sum(j["tasks"] for j in njobs)
            print(f"  exec {x['id']:4d} {(x['t1'] - x['t0']) / 1000:7.3f}s "
                  f"jobs={len(njobs):2d} tasks={tasks:4d}  "
                  f"{x['desc'][:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
