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


class RbacState:
    """Idempotent user/role/privilege apply state (K2 semantics for the RBAC
    surface; reference handlers channel_writer.go:1065-1206 describe-before-
    mutate: createRole lists roles first and skips existing, operatePrivilege
    tolerates already-granted).

    Catalog-sized (users × roles × grants), lives driver-side exactly like
    the reference's target-Milvus metadata — never joined against data paths.
    """

    def __init__(self) -> None:
        self.credentials: set[str] = set()
        self.roles: set[str] = set()
        self.user_roles: set[tuple[str, str]] = set()
        self.privileges: set[tuple[str, str]] = set()
        self.privilege_groups: set[str] = set()

    def apply(self, op: dict) -> str:
        """Apply one RBAC op. Returns 'created'|'skipped'|'dropped'|'updated'."""
        kind = op["op_type"]
        who = op.get("principal", "")
        obj = op.get("object", "")
        if kind == "create_credential":
            if who in self.credentials:
                return "skipped"
            self.credentials.add(who)
            return "created"
        if kind == "delete_credential":
            if who not in self.credentials:
                return "skipped"
            self.credentials.discard(who)
            return "dropped"
        if kind == "update_credential":
            return "updated" if who in self.credentials else "skipped"
        if kind == "create_role":
            if who in self.roles:
                return "skipped"
            self.roles.add(who)
            return "created"
        if kind == "drop_role":
            if who not in self.roles:
                return "skipped"
            self.roles.discard(who)
            return "dropped"
        if kind == "operate_user_role":
            pair = (who, obj)
            if op.get("revoke"):
                if pair not in self.user_roles:
                    return "skipped"
                self.user_roles.discard(pair)
                return "dropped"
            if pair in self.user_roles:
                return "skipped"
            self.user_roles.add(pair)
            return "created"
        if kind in ("operate_privilege", "operate_privilege_v2"):
            pair = (who, obj)
            if op.get("revoke"):
                if pair not in self.privileges:
                    return "skipped"
                self.privileges.discard(pair)
                return "dropped"
            if pair in self.privileges:
                return "skipped"
            self.privileges.add(pair)
            return "created"
        if kind == "create_privilege_group":
            if obj in self.privilege_groups:
                return "skipped"
            self.privilege_groups.add(obj)
            return "created"
        if kind == "drop_privilege_group":
            if obj not in self.privilege_groups:
                return "skipped"
            self.privilege_groups.discard(obj)
            return "dropped"
        if kind == "operate_privilege_group":
            return "updated" if obj in self.privilege_groups else "skipped"
        return "ignored"


def apply_ddl_op(
    spark: SparkSession,
    op: dict,
    rbac: RbacState | None = None,
    enable_user_role: bool = False,
) -> str:
    """Dispatch one DDL op-event (channel_writer.go opMessageFuncs table,
    116-141, RBAC rows 126-141). Returns 'created' | 'skipped' | 'dropped' |
    'updated' | 'filtered' | 'ignored'.

    RBAC ops route to the RbacState only when ``enable_user_role`` (the P3
    gate, reference replicate option) — otherwise they are 'filtered'.
    """
    from milvus_cdc_spark.operators.filters import RBAC_OP_TYPES

    kind = op["op_type"]
    if kind in RBAC_OP_TYPES:
        if not enable_user_role:
            return "filtered"
        return (rbac or RbacState()).apply(op)
    if kind == "create_collection":
        made = ensure_table(spark, op["collection"], op["schema_ddl"])
        return "created" if made else "skipped"
    if kind == "drop_collection":
        return "dropped" if drop_table_if_exists(spark, op["collection"]) else "skipped"
    if kind == "create_database":
        return "created" if ensure_database(spark, op["db"]) else "skipped"
    # load/release/flush/index ops have no Spark-side materialization
    return "ignored"
