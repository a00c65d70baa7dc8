"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every config here is chosen to also be
the right default on a large cluster: AQE on (runtime re-planning, skew-join
handling, partition coalescing), broadcast threshold sized for dimension
tables, Arrow enabled for the (rare) pandas exchange paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the driver harness (local[32], 128 GiB) but expressed so
# they scale: shuffle partitions are overridable via env; AQE coalesces them
# down at runtime, so a too-high static value is cheap.
_DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # The driver's testdata parquet carries TIMESTAMP(NANOS) which the Spark
    # reader rejects; read as int64 nanos and convert in load_tables (DuckDB
    # likewise truncates ns -> us, so both engines see identical values).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Driver testdata columns stored as TIMESTAMP(NANOS): converted ns->us on load.
_NANO_TS_COLS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "events": ["ts"],
}


def get_spark(app_name: str = "openapc-olap-spark", master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default configs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) so
    tests and bench share one code path; on a real cluster the caller passes
    the cluster master / lets spark-submit set it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and os.environ.get("SPARK_GRAFT_CPUS"):
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    for k, v in _DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register each ``{sf_dir}/{name}.parquet`` as a temp view; return dict of DataFrames.

    Views let both the DataFrame API and ``spark.sql`` paths address the same
    tables, mirroring the reference's one-table-per-cube catalog
    (assets_generator.py:566-585).
    """
    names = names or ["region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents", "embeddings"]
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    try:
        # defensive: the driver may hand us a session built without our
        # factory; this conf is runtime-settable and required to read the
        # testdata's TIMESTAMP(NANOS) columns
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for c in _NANO_TS_COLS.get(name, []):
                if c in df.columns and isinstance(df.schema[c].dataType, LongType):
                    # integer DIV (not /): float division loses precision on
                    # ~1e18 nanosecond epoch values
                    df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
