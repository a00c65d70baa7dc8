"""CLI — the reference's operational surface (README.md:13, update_olap.sh),
Spark-first:

    python -m openapc_olap_spark load  --data-dir CSVDIR --out CUBEDIR
    python -m openapc_olap_spark model --out CUBEDIR [--file model.json]
    python -m openapc_olap_spark serve --out CUBEDIR [--host H] [--port P]

``load`` replaces ``assets_generator.py tables`` (CSV -> derived cubes, here
Parquet instead of PostgreSQL), ``model`` replaces ``assets_generator.py
model`` (model.json emission), ``serve`` replaces the Flask slicer
(olap_server.py) with the WSGI façade over the Spark engine.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="openapc_olap_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_load = sub.add_parser("load", help="build cubes from OpenAPC CSVs")
    p_load.add_argument("--data-dir", required=True)
    p_load.add_argument("--out", required=True)

    p_model = sub.add_parser("model", help="emit cubes-compatible model.json")
    p_model.add_argument("--out", required=True)
    p_model.add_argument("--file", default="model.json")

    p_serve = sub.add_parser("serve", help="serve the slicer HTTP API")
    p_serve.add_argument("--out", required=True)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=5000)

    args = p.parse_args(argv)

    from openapc_olap_spark.session import get_spark
    spark = get_spark(app_name=f"openapc-{args.cmd}")

    if args.cmd == "load":
        from openapc_olap_spark.etl.openapc import InputPaths, OpenAPCPipeline
        OpenAPCPipeline(spark, InputPaths.under(args.data_dir)).write(args.out)
        print(f"cubes written to {args.out}")
        return 0

    from openapc_olap_spark.catalog import (
        build_openapc_registry, load_manifest, register_cube_tables)
    register_cube_tables(spark, args.out)
    registry = build_openapc_registry(load_manifest(spark, args.out))

    if args.cmd == "model":
        with open(args.file, "w", encoding="utf-8") as f:
            json.dump(registry.to_model_dict(), f, indent=2)
        print(f"model written to {args.file}")
        return 0

    if args.cmd == "serve":
        from openapc_olap_spark.query import QueryEngine
        from openapc_olap_spark.server import SlicerApp, serve
        app = SlicerApp(QueryEngine(spark, registry))
        print(f"serving slicer API on http://{args.host}:{args.port}")
        serve(app, args.host, args.port)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
