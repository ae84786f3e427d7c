"""Window/ordering operators (SURVEY §2.6).

- W1 in-pack stable sort (delete-before-insert tie-break)
- W2 latest-version-of-name dedupe
- W3 monotonic timestamp rebase (dense_rank within pack)
- W5 lag-style last-sent tracking

All are single-shuffle window functions: one exchange on the partition key,
then sorted evaluation within partitions — exactly the plan you want at
scale (no driver involvement, AQE can coalesce the post-shuffle partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sort_keys(ts_col: str = "ts", op_col: str = "op_type") -> list:
    """W1: sort msgs by BeginTs with Delete before Insert on equal ts
    (replicate_channel_manager.go:1450-1454)."""
    return [
        F.col(ts_col).asc(),
        F.when(F.col(op_col) == "delete", F.lit(0)).otherwise(F.lit(1)).asc(),
    ]


def latest_version_dedupe(df: DataFrame, partition_keys: list[str], order_col: str) -> DataFrame:
    """W2: repeated collection names keep only the max-CreateTime instance
    (core/reader/collection_reader.go:203-238). row_number desc = 1."""
    w = Window.partitionBy(*partition_keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def monotonic_rebase(
    df: DataFrame,
    partition_keys: list[str],
    ts_col: str,
    base_col: str,
) -> DataFrame:
    """W3/T2: if a pack's timestamps regressed below the channel's max-ts, the
    reference rebases the whole pack onto a new base, preserving intra-pack
    order via the dense rank of each msg's BeginTs
    (replicate_channel_manager.go:1846-1875). Column math + one window."""
    w = Window.partitionBy(*partition_keys).orderBy(F.col(ts_col).asc())
    return df.withColumn(
        "rebased_ts", (F.col(base_col) + F.dense_rank().over(w)).cast("bigint")
    )


def last_sent_lag(df: DataFrame, partition_keys: list[str], ts_col: str) -> DataFrame:
    """W5: per-channel last-sent-ts tracking (ts_manager.go:338-366) — decides
    whether a TimeTick needs emitting. Batch analog: lag() over the channel
    partition ordered by time."""
    w = Window.partitionBy(*partition_keys).orderBy(F.col(ts_col).asc())
    return df.withColumn("prev_ts", F.lag(F.col(ts_col)).over(w)).withColumn(
        "gap", F.col(ts_col) - F.coalesce(F.col("prev_ts"), F.col(ts_col))
    )
