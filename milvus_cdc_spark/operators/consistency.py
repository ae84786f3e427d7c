"""Consistency-level reads (guarantee_ts) and collection TTL visibility.

Milvus read semantics the replicated data must honor:

- **Consistency levels** pick a ``guarantee_ts`` the reader waits for:
  Strong = latest ts, BoundedStaleness = latest minus a graceful window
  (default 5 s), Eventually = whatever is already serviceable. The
  reference preserves exactly this ts order end-to-end (hybrid-TSO
  passthrough, core/reader/replicate_channel_manager.go monotonic-ts
  path), so a batch read of the replica at guarantee_ts G is "replay ops
  with ts <= G". The serviceable ts of a replica is the channel-safe
  watermark: min over vchannels of max applied ts (same quantity as the
  A4 global min-ts aggregate).
- **Collection TTL** (``collection.ttl.seconds`` property, replicated
  through the DDL/properties path): entities whose latest insert is older
  than now − ttl are invisible to reads; ttl 0 means no expiry.

Spark-first: cutoffs are 1-row aggregates broadcast onto the op-log
(no collect, no driver state); replay is the same partial+final
conditional aggregate as operators.apply.replay_alive. At 100 TB the
levels dimension multiplies per-row work by its tiny cardinality but
adds no extra shuffle — the aggregate still carries one row per
(level, collection, pk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hybrid-TSO physical-ms shift (Milvus TSO layout: physical ms << 18).
TSO_SHIFT = 18

#: BoundedStaleness graceful window, ms (Milvus default 5 s).
BOUNDED_GRACEFUL_MS = 5_000


def guarantee_ts_levels(ops: DataFrame) -> DataFrame:
    """One row per consistency level: (level, guarantee_ts).

    Strong = max ts in the log; Bounded = Strong − (5 s << 18);
    Eventually = serviceable watermark = min over vchannels of max ts.
    """
    strong = ops.agg(F.max("ts").alias("guarantee_ts")).select(
        F.lit("1_strong").alias("level"), "guarantee_ts"
    )
    bounded = ops.agg(
        (F.max("ts") - F.lit(BOUNDED_GRACEFUL_MS << TSO_SHIFT)).alias("guarantee_ts")
    ).select(F.lit("2_bounded").alias("level"), "guarantee_ts")
    eventually = (
        ops.groupBy("vchannel")
        .agg(F.max("ts").alias("ch_max"))
        .agg(F.min("ch_max").alias("guarantee_ts"))
        .select(F.lit("3_eventually").alias("level"), "guarantee_ts")
    )
    return strong.unionByName(bounded).unionByName(eventually)


def read_at_levels(ops: DataFrame) -> DataFrame:
    """Per (level, collection) alive counts after replaying ops with
    ts <= the level's guarantee_ts — the visible state a client at that
    consistency level observes on the replica."""
    levels = guarantee_ts_levels(ops)
    seen = ops.crossJoin(F.broadcast(levels)).filter(
        F.col("ts") <= F.col("guarantee_ts")
    )
    agg = seen.groupBy("level", "collection", "pk").agg(
        F.max(F.when(F.col("op_type") == "insert", F.col("ts"))).alias("last_insert_ts"),
        F.max(F.when(F.col("op_type") == "delete", F.col("ts"))).alias("last_delete_ts"),
        F.sum(
            F.when(F.col("op_type") == "insert", F.col("num_rows")).otherwise(F.lit(0))
        ).alias("n_inserts"),
    )
    alive = agg.filter(
        F.col("last_insert_ts").isNotNull()
        & (
            F.col("last_delete_ts").isNull()
            | (F.col("last_insert_ts") >= F.col("last_delete_ts"))
        )
    )
    return (
        alive.groupBy("level", "collection")
        .agg(
            F.count("*").alias("alive_pks"),
            F.sum("n_inserts").alias("total_inserts"),
        )
        .orderBy("level", "collection")
    )


def ttl_visible(alive: DataFrame, ttl_props: DataFrame) -> DataFrame:
    """Split replayed-alive rows into visible vs TTL-expired per collection.

    ``alive`` is operators.apply.replay_alive output (collection, pk,
    last_insert_ts, ...); ``ttl_props`` is the replicated collection
    properties dim (collection, ttl_seconds), ttl 0 = no expiry. "now" is
    the latest insert ts in the data (deterministic batch analog of the
    server clock). Properties side is catalog-sized → broadcast.
    """
    now = alive.agg(F.max("last_insert_ts").alias("now_ts"))
    joined = (
        alive.join(F.broadcast(ttl_props), "collection", "left")
        .crossJoin(F.broadcast(now))
        .withColumn(
            "visible",
            (F.coalesce(F.col("ttl_seconds"), F.lit(0)) == 0)
            | (
                F.col("last_insert_ts")
                >= F.col("now_ts")
                - F.shiftleft(F.col("ttl_seconds") * 1000, TSO_SHIFT)
            ),
        )
    )
    return (
        joined.groupBy("collection", "ttl_seconds")
        .agg(
            F.sum(F.when(F.col("visible"), 1).otherwise(0)).alias("visible_pks"),
            F.sum(F.when(F.col("visible"), 0).otherwise(1)).alias("expired_pks"),
        )
        .orderBy("collection")
    )
