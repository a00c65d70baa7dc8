"""Generic dataset IO (SURVEY.md §2.1 S-surface extension): one write/read
pair over every Spark-native columnar/text format (parquet, orc, csv,
json), with the layout knobs a 100 TB table needs applied consistently —
hash partitioning into a bounded file count, hive-style partition columns
for pruning, and within-file sort for row-group min/max skipping.

The reference only ever emits parquet + CSV exports
(assets_generator.py's table writer); this generalizes that sink so a
pipeline can land the same frame in whichever format its consumers need
without re-deriving the layout discipline each time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "orc", "csv", "json")


def write_dataset(df: DataFrame, path: str, fmt: str = "parquet",
                  partition_by: list[str] | None = None,
                  sort_by: list[str] | None = None,
                  num_files: int | None = None,
                  mode: str = "overwrite", **options) -> None:
    """Write ``df`` at ``path`` in ``fmt``.

    - ``num_files`` repartitions (hash on the partition columns when
      given, round-robin otherwise) so the sink emits a bounded file
      count instead of one file per upstream task — the small-files guard.
    - ``sort_by`` applies sortWithinPartitions before the write, giving
      columnar formats ordered row-group/stripe min-max stats (the same
      discipline the institutional cube sink uses).
    - ``partition_by`` emits hive-style directories for partition pruning.
    - csv writes a header by default (override via options).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    out = df
    if num_files:
        out = (out.repartition(num_files, *partition_by) if partition_by
               else out.repartition(num_files))
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).options(**options).save(path)


def read_dataset(spark: SparkSession, path: str, fmt: str = "parquet",
                 schema=None, **options) -> DataFrame:
    """Read a dataset written by ``write_dataset``. For the schemaless
    text formats (csv/json) pass ``schema`` for a scan that needs neither
    inference pass nor permissive typing; columnar formats carry their
    own."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)
