"""ETL layer: the reference's cube-building pipelines as DataFrame transforms.

Reference: assets_generator.py (792 LoC of row-at-a-time Python accumulating
every table in driver RAM). Here each cube is a declarative DataFrame derived
from the raw CSVs — distributed, spill-safe, and Catalyst-optimized — with the
reference's semantic quirks (string types, "NA" missing values, colon scrubs,
banker's-rounding notes) preserved where observable.
"""

from openapc_olap_spark.etl.schemas import (  # noqa: F401
    APC_COLUMNS, BPC_COLUMNS, TA_COLUMNS, DEAL_COLUMNS, APC_AC_COLUMNS,
    INSTITUTIONS_COLUMNS, csv_schema,
)
from openapc_olap_spark.etl.openapc import OpenAPCPipeline  # noqa: F401
