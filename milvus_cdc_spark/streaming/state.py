"""Stateful streaming operators: the drop-barrier as a streaming aggregate
(SURVEY §2.9 T3; reference core/reader/data_barrier.go:27-59 count-to-N +
restart-safe ready-set core/api/task_msg.go:44-56).

Spark shape: ``groupBy(object).agg(collect_set(vchannel))`` in update mode.
Structured Streaming keeps the per-object set in the state store (backed by
the checkpoint → restart-safe exactly like the reference's persisted
ReplicateMeta). A foreachBatch consumer releases objects whose set reached
the expected channel count.

An applyInPandasWithState variant is deliberately NOT used: the built-in
streaming aggregate covers the semantics with less code and JVM-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def barrier_stream(drops: DataFrame, expected: int) -> DataFrame:
    """Streaming barrier aggregate over a stream of drop signals.

    ``drops`` is a *streaming* DataFrame with (object_id, vchannel).
    Returns a streaming aggregate with is_ready per object; run it in
    update mode and act on rows where is_ready becomes true.
    """
    agg = drops.groupBy("object_id").agg(
        F.array_sort(F.collect_set("vchannel")).alias("ready_channels")
    )
    return agg.withColumn("n_ready", F.size("ready_channels")).withColumn(
        "is_ready", F.col("n_ready") >= F.lit(expected)
    )
