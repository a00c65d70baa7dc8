"""Benchmark runner (driver contract): run every declared query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Protocol (BASELINE.md): per query 1 warm-up + ``BENCH_RUNS`` timed runs
(median reported); timing covers plan + execute + collect, the same work the
driver's gate does. Config knobs recorded in the JSON so numbers stay
comparable across rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from openapc_olap_spark.session import get_spark  # noqa: E402

BENCH_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    per_query: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, sf_dir).collect()          # warm-up: plan + IO caches
            times = []
            for _ in range(BENCH_RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                times.append(time.perf_counter() - t0)
            per_query[name] = round(statistics.median(times), 4)
        except Exception as e:  # a broken query gets a sentinel, not a crash
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            per_query[name] = -1.0
    total = round(sum(t for t in per_query.values() if t > 0), 4)
    print(json.dumps({
        "metric": "sum of per-query median wall-clock (warm), full declared query set",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "config": {
            "spark": spark.version,
            "master": f"local[{cpus}]",
            "runs": BENCH_RUNS,
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
