"""Clustering-compaction statistics and zone-map pruning (Milvus 2.4
clustering key / PartitionStats: major compaction redistributes segments
by a clustering key and records per-segment key min/max, so a range
predicate prunes whole segments before any scan — milvus.io Clustering
Compaction; the reference replicates the clustering-key schema field
like any other, and the replica's reader benefits only if the engine
rebuilds the same pruning stats).

Spark-first: the "segments" are equal-width key ranges; the stats frame
is one map-side-combined aggregate (n_buckets rows — catalog-sized, the
PartitionStats analog); pruning verdicts are pure column predicates on
that frame. At 100 TB the same stats come free from parquet row-group
zone maps when data is WRITTEN clustered — `repartitionByRange(key)`
before the write is the compaction; this module computes the stats the
pruning decision needs when the layout is inherited rather than
rewritten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bucket_stats(
    df: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Per-range-bucket (segment analog) stats of the clustering key:
    bucket id, row count, key min/max. Bucket width derives from the
    key's max via a 1-row broadcast — ``floor(key / ceil((max+1)/n))``
    — so bucketing is deterministic and engine-portable (exact integer
    arithmetic only)."""
    key = F.col(key_col)
    mx = df.agg(F.max(key).cast("bigint").alias("_mx"))
    width = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil((F.col("_mx") + 1) / F.lit(n_buckets)).cast("bigint"),
    )
    return (
        df.crossJoin(F.broadcast(mx))
        .select(
            F.floor(key.cast("bigint") / width).cast("bigint").alias("bucket_id"),
            key.cast("bigint").alias("_k"),
        )
        .groupBy("bucket_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
    )


def prune_verdict(lo: Column | int, hi: Column | int) -> Column:
    """Zone-map pruning predicate for a ``key BETWEEN lo AND hi`` scan
    over ``range_bucket_stats`` output: a bucket survives iff its
    [min_key, max_key] intersects [lo, hi] — false means the whole
    segment is skipped without reading a row."""
    lo_c = lo if isinstance(lo, Column) else F.lit(lo)
    hi_c = hi if isinstance(hi, Column) else F.lit(hi)
    return ~((F.col("max_key") < lo_c) | (F.col("min_key") > hi_c))
