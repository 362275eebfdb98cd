from deg04_local_data_lake_spark.functions.portable import (
    dec,
    exact_avg,
    exact_std,
    exact_sum,
    md5_long,
)

__all__ = ["dec", "exact_avg", "exact_std", "exact_sum", "md5_long"]
