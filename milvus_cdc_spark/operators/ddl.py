"""Idempotent DDL application (K2).

Reference: the Milvus DDL sink describes-before-creating — CreateCollection
checks Describe first and logs "skip create collection request, … has
existed" (core/writer/milvus_handler.go:114-138); same for partitions
(195-226) and databases (372-396). Spark analog: catalog checks +
`CREATE TABLE IF NOT EXISTS`, applied inside foreachBatch for DDL op
messages.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def ensure_database(spark: SparkSession, name: str) -> bool:
    """Returns True if created, False if it already existed (skip path)."""
    if spark.catalog.databaseExists(name):
        return False
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")
    return True


def ensure_table(
    spark: SparkSession, name: str, schema_ddl: str, location: str | None = None
) -> bool:
    """CREATE TABLE IF NOT EXISTS with an explicit schema; True if created."""
    if spark.catalog.tableExists(name):
        return False
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING parquet{loc}")
    return True


def drop_table_if_exists(spark: SparkSession, name: str) -> bool:
    if not spark.catalog.tableExists(name):
        return False
    spark.sql(f"DROP TABLE {name}")
    return True


def apply_ddl_op(spark: SparkSession, op: dict) -> str:
    """Dispatch one DDL op-event (channel_writer.go opMessageFuncs table,
    116-141). Returns 'created' | 'skipped' | 'dropped' | 'ignored'."""
    kind = op["op_type"]
    if kind == "create_collection":
        made = ensure_table(spark, op["collection"], op["schema_ddl"])
        return "created" if made else "skipped"
    if kind == "drop_collection":
        return "dropped" if drop_table_if_exists(spark, op["collection"]) else "skipped"
    if kind == "create_database":
        return "created" if ensure_database(spark, op["db"]) else "skipped"
    # load/release/flush/index ops have no Spark-side materialization
    return "ignored"
