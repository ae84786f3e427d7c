"""Barrier aggregation (SURVEY §2.5 A1/A2, §2.9 T3).

The reference applies a DropCollection/DropPartition only after every one of
the object's N vchannels has delivered the drop message
(core/reader/data_barrier.go:27-59 count-to-N barrier; restart-safe variant
persists the ready-channel set, core/api/task_msg.go:44-56).

Spark-first: a barrier is a grouped set-union aggregate —
``groupBy(object).agg(collect_set(vchannel))`` with readiness =
``size(set) == expected``. In batch this is one hash aggregation; in
streaming the same aggregate runs with state in the checkpoint (see
streaming.state for the applyInPandasWithState variant). Map-side partial
aggregation means each shuffle partition sends at most one partial set per
object — cheap at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def barrier_status(
    drops: DataFrame,
    object_keys: list[str],
    channel_col: str = "vchannel",
    expected_col: str | None = None,
    expected: int | None = None,
) -> DataFrame:
    """Per object: the set of channels that delivered the signal, and whether
    the barrier fired (set size == expected channel count).

    ``expected`` may be a constant or a per-object column. Output columns:
    object_keys…, ready_channels (sorted array), n_ready, is_ready.
    """
    agg = drops.groupBy(*object_keys).agg(
        F.array_sort(F.collect_set(F.col(channel_col))).alias("ready_channels"),
        F.count("*").alias("n_signals"),
    )
    agg = agg.withColumn("n_ready", F.size(F.col("ready_channels")))
    if expected_col is not None:
        cond = F.col("n_ready") == F.col(expected_col)
    else:
        cond = F.col("n_ready") == F.lit(expected)
    return agg.withColumn("is_ready", cond)
