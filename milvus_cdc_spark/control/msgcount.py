"""Per-channel message accounting (the msg_count tool's core).

Reference: server/tool/msg_count/main.go — MsgCount (main.go:419+)
accumulates per-type counts plus ``insert_count``/``delete_count``
summed over each message's NumRows while walking a channel from a seek
position; GetMQMessageDetail (main.go:269-343) reports the channel's
end position and its physical msg time. The batch analog is ONE
aggregation keyed by (vchannel, op_type) — a single shuffle whose
output cardinality is channels × op types (control-sized).

``scripts/msg_count.py`` wraps this as the offline CLI; the
``channel_msg_counts`` suite query gives it an oracle-checked row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.functions.ts import physical_timestamp
from milvus_cdc_spark.operators.filters import insert_like


def count_messages(
    spark,
    ops: DataFrame,
    positions: DataFrame | None = None,
    from_ts: int | None = None,
    to_ts: int | None = None,
    collection: str | None = None,
) -> DataFrame:
    """Per-channel message accounting over an op-log frame.

    Returns one row per vchannel: per-type counts folded to a
    ``type_counts`` map, ``insert_count``/``delete_count`` (num_rows
    sums over insert-like / delete ops — MsgCount's NumRows totals),
    ``n_msgs``, ``end_ts`` (the channel's end position) and ``end_time``
    (its physical wall-clock time). ``positions`` (vchannel,
    position_ts) seeks each channel strictly past its stored position
    ("not including the current msg", main.go:294-301); channels absent
    from ``positions`` count from earliest
    (SubscriptionPositionEarliest, main.go:284-286). ``from_ts``/
    ``to_ts`` bound the window globally (from exclusive, to inclusive);
    ``collection`` mirrors the tool's CollectionID scoping
    (main.go:425-429).
    """
    if collection is not None:
        ops = ops.filter(F.col("collection") == collection)
    if from_ts is not None:
        ops = ops.filter(F.col("ts") > from_ts)
    if to_ts is not None:
        ops = ops.filter(F.col("ts") <= to_ts)
    if positions is not None:
        pos = positions.select("vchannel", F.col("position_ts").alias("_seek"))
        ops = (
            ops.join(F.broadcast(pos), "vchannel", "left")
            .filter(F.col("_seek").isNull() | (F.col("ts") > F.col("_seek")))
            .drop("_seek")
        )
    per_type = ops.groupBy("vchannel", "op_type").agg(
        F.count("*").alias("n"),
        F.sum("num_rows").alias("rows"),
        F.max("ts").alias("max_ts"),
    )
    return (
        per_type.groupBy("vchannel")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("op_type"), F.col("n")))
                )
            ).alias("type_counts"),
            F.sum("n").alias("n_msgs"),
            F.sum(F.when(insert_like(), F.col("rows")).otherwise(0)).alias(
                "insert_count"
            ),
            F.sum(
                F.when(F.col("op_type") == "delete", F.col("rows")).otherwise(0)
            ).alias("delete_count"),
            F.max("max_ts").alias("end_ts"),
        )
        .withColumn("end_time", physical_timestamp(F.col("end_ts")))
        .orderBy("vchannel")
    )
