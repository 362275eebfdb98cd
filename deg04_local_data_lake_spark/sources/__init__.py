from deg04_local_data_lake_spark.sources.readers import (
    load_table,
    read_csv,
    read_lake_table,
    read_parquet,
)
from deg04_local_data_lake_spark.sources.writers import write_lake_table

__all__ = [
    "load_table",
    "read_csv",
    "read_lake_table",
    "read_parquet",
    "write_lake_table",
]
