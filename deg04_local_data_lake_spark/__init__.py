"""deg04_local_data_lake_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the capability surface of the
reference lakehouse application ``ramsjenu/DEG04-local-data-lake`` (see
SURVEY.md): CSV/Parquet/lake-format ingest, medallion (bronze/silver/gold)
transforms, CDC upsert, catalog DDL — extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Everything is expressed on the DataFrame/SQL API so Catalyst/Tungsten pick
the physical strategy; Python-side loops and row-at-a-time UDFs are avoided
in all hot paths.
"""

from deg04_local_data_lake_spark.session import get_spark_session

__all__ = ["get_spark_session"]
__version__ = "0.1.0"
