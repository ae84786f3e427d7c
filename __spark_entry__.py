"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``milvus_cdc_spark.suite`` — the operator inventory with
paired DuckDB oracles lives there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from milvus_cdc_spark import suite

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return suite.q1_pricing_summary(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.get_queries()


def oracle_sql() -> dict[str, str]:
    return suite.get_oracles()
