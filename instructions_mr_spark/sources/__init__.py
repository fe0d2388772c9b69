from instructions_mr_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views  # noqa: F401
from instructions_mr_spark.sources.io import (  # noqa: F401
    jsonl_scan,
    jsonl_sink,
    csv_scan,
    csv_sink,
    parquet_scan,
    parquet_sink,
    md_sink,
)
