"""openapc_olap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of OpenAPC/openapc-olap.

The reference (read-only at /root/reference) is a configuration-and-ETL
wrapper around the `cubes` OLAP framework + PostgreSQL. This package
re-expresses that surface Spark-first:

- :mod:`openapc_olap_spark.model`   — cube/dimension/measure/aggregate registry
  (reference: generated model.json, static/templates/MODEL_*).
- :mod:`openapc_olap_spark.cuts`    — the slicer cut grammar (point / range /
  set / negation) compiled to Catalyst ``Column`` predicates
  (reference contract: HOWTO.md:73-91).
- :mod:`openapc_olap_spark.query`   — QuerySpec IR + compiler to DataFrame
  plans: facts / aggregate+drilldown / members / fact-by-id / pagination /
  summary+cells envelope (reference: olap_server.py + pinned cubes dep).
- :mod:`openapc_olap_spark.etl`     — the ETL dataflow operators of
  assets_generator.py re-expressed as pure DataFrame transforms.
- :mod:`openapc_olap_spark.operators` / ``functions`` — driver-mandated
  LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal, event windows) built for 100 TB scale.
"""

__version__ = "0.1.0"

from openapc_olap_spark.session import get_spark  # noqa: F401
