from parquet_modular_encryption_spark.sources.datasets import TABLES, load, view

__all__ = ["TABLES", "load", "view"]
