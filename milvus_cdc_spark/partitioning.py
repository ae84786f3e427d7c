"""Scan-parallelism guard for CPU-heavy work over small local fixtures.

Spark sizes input splits by BYTES, and a parquet file is only splittable
at row-group boundaries — the test fixtures are single-row-group files,
so every scan of them is ONE task regardless of
``spark.sql.files.maxPartitionBytes``. Any operator whose per-row work
is expensive relative to its input bytes (md5 coin-flip derivations,
vector math, shingling) then serializes its whole pipelined stage on one
core with 31 idle. SCALE.md §5p measured this for row-EXPANDING
operators (`similarity.parallelize_expansion`); the r14 stage profiles
show the same trap for expression-DENSE projections: the oplog
derivation's md5/concat/timestamp chain plus the map-side partial
aggregate of the downstream groupBy all run inside the single-split scan
stage (measured 1.3-3.7 s single-threaded at sf0.1 across the CDC
replay / consistency-read family).

``widen_small_scan`` round-robins the frame up to the session's default
parallelism ONLY when its current plan carries fewer partitions. At real
scale a 100 TB table arrives with thousands of splits, so the helper
reduces to the getNumPartitions probe — the same no-op-at-scale contract
as parallelize_expansion. ``SPARK_GRAFT_WIDEN_SCAN=off`` disables it
(the A/B kill-switch; also the right setting if a deployment's fixture
files are already multi-row-group).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def widen_small_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` up to defaultParallelism when its plan has
    fewer partitions — no-op on well-split inputs.

    With ``key_cols`` the exchange is HASH partitioning on those columns
    — preferred when a high-cardinality deterministic key exists,
    because a keyless ``repartition(n)`` first pays a LOCAL SORT of its
    input (``spark.sql.execution.sortBeforeRepartition``, needed so task
    retries reproduce the round-robin assignment; guide §2.5) and on a
    single-split scan that sort runs on the one task this helper exists
    to relieve. Hash partitioning is deterministic per row, so it needs
    no such sort.
    """
    if os.environ.get("SPARK_GRAFT_WIDEN_SCAN", "auto") == "off":
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key_cols:
            from pyspark.sql import functions as F

            return df.repartition(target, *[F.col(c) for c in key_cols])
        return df.repartition(target)
    return df
