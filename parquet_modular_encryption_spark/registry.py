"""Central query registry.

Every implemented operator registers one named query (a builder taking
``(spark, sf_dir)`` and returning a DataFrame) plus, when SQL-expressible,
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. ``__spark_entry__.py`` exposes the registry to the driver, which
hash-compares Spark vs DuckDB results (row count + schema + order-
insensitive value hash). See SURVEY.md §5 for the strategy.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

_REGISTRY: dict[str, "Query"] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "parquet_modular_encryption_spark.operators.relational",
    "parquet_modular_encryption_spark.operators.window",
    "parquet_modular_encryption_spark.operators.grouping",
    "parquet_modular_encryption_spark.operators.events",
    "parquet_modular_encryption_spark.operators.advanced",
    "parquet_modular_encryption_spark.operators.tpch_extra",
    "parquet_modular_encryption_spark.operators.lifecycle",
    "parquet_modular_encryption_spark.operators.storage",
    "parquet_modular_encryption_spark.operators.sampling",
    "parquet_modular_encryption_spark.operators.encrypted",
    "parquet_modular_encryption_spark.sources.python_datasource",
    "parquet_modular_encryption_spark.pipeline.pandas_ops",
    "parquet_modular_encryption_spark.pipeline.textops",
    "parquet_modular_encryption_spark.pipeline.dedup",
    "parquet_modular_encryption_spark.pipeline.similarity",
    "parquet_modular_encryption_spark.pipeline.multimodal",
    "parquet_modular_encryption_spark.pipeline.curation",
)


@dataclass(frozen=True)
class Query:
    name: str
    builder: QueryFn
    oracle: str | None = None  # None => driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module and return the full registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(sorted(_REGISTRY.items()))
