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


#: Non-RBAC opMessageFuncs rows (channel_writer.go:118-128).
INDEX_OP_TYPES = ("create_index", "drop_index", "alter_index")
LOAD_OP_TYPES = (
    "load_collection",
    "release_collection",
    "load_partitions",
    "release_partitions",
)
DATABASE_OP_TYPES = ("create_database", "drop_database", "alter_database")


class IndexState:
    """Idempotent index-registry apply (createIndex/dropIndex/alterIndex
    handlers, channel_writer.go:121-124). Keyed by (collection, field,
    index_name); create is describe-before-create like K2, alter merges
    params. The registry is what a search planner consults for
    index_type/metric_type (see analytics.similarity.metric_topk — the
    metric a replica searches with comes from the replicated index)."""

    def __init__(self) -> None:
        self.indexes: dict[tuple[str, str, str], dict] = {}

    def apply(self, op: dict) -> str:
        key = (
            op["collection"],
            op.get("field", "_default"),
            op.get("index_name", "_default_idx"),
        )
        kind = op["op_type"]
        if kind == "create_index":
            if key in self.indexes:
                return "skipped"
            self.indexes[key] = {
                "index_type": op.get("index_type", "IVF_FLAT"),
                "metric_type": op.get("metric_type", "COSINE"),
                "params": dict(op.get("params", {})),
            }
            return "created"
        if kind == "drop_index":
            return "dropped" if self.indexes.pop(key, None) is not None else "skipped"
        if kind == "alter_index":
            if key not in self.indexes:
                return "skipped"
            self.indexes[key]["params"].update(op.get("params", {}))
            return "updated"
        return "ignored"

    def metric_for(self, collection: str, field: str = "_default") -> str | None:
        for (c, f, _), meta in self.indexes.items():
            if c == collection and f == field:
                return meta["metric_type"]
        return None


class LoadState:
    """load/release collection/partitions + flush markers
    (channel_writer.go:122-128 handlers loadCollection/releaseCollection/
    loadPartitions/releasePartitions/flush). Loaded-ness gates reads the
    way Milvus does (querying an unloaded collection errors); flush
    records the seal point per collection."""

    def __init__(self) -> None:
        self.loaded: dict[str, dict] = {}
        self.flushed: dict[str, int] = {}

    def apply(self, op: dict) -> str:
        coll = op.get("collection", "")
        kind = op["op_type"]
        if kind == "load_collection":
            if coll in self.loaded and self.loaded[coll]["partitions"] is None:
                return "skipped"
            self.loaded[coll] = {
                "replicas": int(op.get("replicas", 1)),
                "partitions": None,  # None = all partitions
            }
            return "created"
        if kind == "release_collection":
            return "dropped" if self.loaded.pop(coll, None) is not None else "skipped"
        if kind == "load_partitions":
            parts = set(op.get("partitions", ()))
            cur = self.loaded.get(coll)
            if cur is not None and (cur["partitions"] is None or parts <= cur["partitions"]):
                return "skipped"
            if cur is None or cur["partitions"] is None:
                self.loaded[coll] = {
                    "replicas": int(op.get("replicas", 1)),
                    "partitions": set(parts),
                }
            else:
                cur["partitions"] |= parts
            return "created"
        if kind == "release_partitions":
            cur = self.loaded.get(coll)
            if cur is None or cur["partitions"] is None:
                return "skipped"
            parts = set(op.get("partitions", ()))
            if not (parts & cur["partitions"]):
                return "skipped"
            cur["partitions"] -= parts
            if not cur["partitions"]:
                del self.loaded[coll]
            return "dropped"
        if kind == "flush":
            self.flushed[coll] = int(op.get("ts", 0))
            return "flushed"
        return "ignored"

    def is_loaded(self, collection: str, partition: str | None = None) -> bool:
        cur = self.loaded.get(collection)
        if cur is None:
            return False
        if partition is None or cur["partitions"] is None:
            return True
        return partition in cur["partitions"]


def apply_ddl_op(
    spark: SparkSession,
    op: dict,
    rbac: RbacState | None = None,
    enable_user_role: bool = False,
    index: IndexState | None = None,
    load: LoadState | None = None,
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
    if kind == "drop_database":
        if not spark.catalog.databaseExists(op["db"]):
            return "skipped"
        spark.sql(f"DROP DATABASE IF EXISTS `{op['db']}`")
        return "dropped"
    if kind == "alter_database":
        return "updated" if spark.catalog.databaseExists(op["db"]) else "skipped"
    if kind in INDEX_OP_TYPES:
        return (index if index is not None else IndexState()).apply(op)
    if kind in LOAD_OP_TYPES or kind == "flush":
        return (load if load is not None else LoadState()).apply(op)
    return "ignored"
