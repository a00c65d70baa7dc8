"""Benchmark runner (driver contract): run every declared query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Protocol (BASELINE.md): per query 1 warm-up + ``BENCH_RUNS`` timed runs
(median reported); timing covers plan + execute + collect, the same work the
driver's gate does. Config knobs recorded in the JSON so numbers stay
comparable across rounds.

Tiered protocol (BASELINE.md "Tiered bench protocol", VERDICT r08 #8):
the FULL declared set (default, what the driver records per round) now
costs ~2 min at sf0.1 and grows every round; intermediate/iteration runs
should time only the queries under work. Pass query names (or prefixes)
as argv, or set ``SPARK_GRAFT_BENCH_QUERIES`` to a comma list:

    python bench.py                      # full set (the per-round record)
    python bench.py x85 x87 x88          # exact names
    python bench.py e q0                 # every e-gate + q01..q09
    SPARK_GRAFT_BENCH_QUERIES=x8 python bench.py

Subset runs stamp ``query_set: "subset(<n>)"`` in the JSON so a partial
number can never be mistaken for a full-set round record.

Production twins (VERDICT r09 #1): gates that self-certify by running BOTH
kernels of a dual-method operator (x35/x53/x59/x87/x89) are timed via their
single-method production twins (``contrib_queries.BENCH_TWINS``) so the
bench measures engine cost, not audit cost; the twinned names are stamped
under ``production_twins`` in the JSON.
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

    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]
    env_q = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    wanted += [q.strip() for q in env_q.split(",") if q.strip()]
    # dual-method certifying gates are timed via their single-method
    # production twins (VERDICT r09 #1): same result frame, engine cost
    # only — the dual-kernel audit cost stays in the correctness gate
    from openapc_olap_spark import contrib_queries, etl_queries
    BENCH_TWINS = {**contrib_queries.BENCH_TWINS,
                   **etl_queries.BENCH_TWINS}
    declared = sorted((n, BENCH_TWINS.get(n, f))
                      for n, f in entrymod.queries().items())
    if wanted:
        declared = [(n, f) for n, f in declared
                    if any(n.startswith(w) for w in wanted)]
        if not declared:
            print(f"bench: no declared query matches {wanted}",
                  file=sys.stderr)
            sys.exit(2)

    per_query: dict[str, float] = {}
    for name, fn in declared:
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
    twinned = sorted(set(per_query) & set(BENCH_TWINS))
    qset = "full" if not wanted else f"subset({len(per_query)})"
    record = {
        "metric": ("sum of per-query median wall-clock (warm), "
                   + ("full declared query set" if not wanted
                      else f"SUBSET of {len(per_query)} queries")),
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "query_set": qset,
        "sf": sf,
        "production_twins": twinned,
        "config": {
            "spark": spark.version,
            "master": f"local[{cpus}]",
            "runs": BENCH_RUNS,
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        },
    }
    line = json.dumps(record)
    print(line)
    # The driver keeps only the LAST ~2000 bytes of stdout (VERDICT r11
    # "What's wrong" #3): when the full record outgrows that window, a
    # compact trailer line — total + the slowest queries only, always
    # under the window — follows it, so the captured tail always ENDS
    # with one parseable contract-shaped JSON line. The committed
    # BENCH_sf*_r{N}.json artifacts carry the full per-query map.
    if len(line) > 1800:
        slow = dict(sorted(per_query.items(), key=lambda kv: -kv[1])[:20])
        compact = dict(record)
        compact["queries"] = {k: round(v, 3) for k, v in slow.items()}
        compact["queries_omitted"] = len(per_query) - len(slow)
        compact["note"] = ("trailer: full per-query map in the line "
                           "above / committed BENCH artifact")
        print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
