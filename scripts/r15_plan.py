"""Dump ``.explain("formatted")`` of declared queries (production-twin
path, same resolution as bench.py) to ``plans/r15/<name>_<tag>.txt`` —
the committed before/after plan evidence for OPTIMIZATION_r15.md.

Usage:
    python scripts/r15_plan.py before x108 x112
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r15_plan.py after x93
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from openapc_olap_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    wanted = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="r15_plan", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from openapc_olap_spark import contrib_queries, etl_queries
    twins = {**contrib_queries.BENCH_TWINS, **etl_queries.BENCH_TWINS}
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    for name, fn in sorted(entrymod.queries().items()):
        if wanted and not any(name.startswith(w) for w in wanted):
            continue
        df = twins.get(name, fn)(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"{name} — production-twin plan, {sf_dir}, "
                     f"local[{cpus}]\n\n")
            fh.write(buf.getvalue())
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
