"""widen_small_scan: the scan-parallelism guard for single-row-group fixtures.

Contract under test (partitioning.py):
- a frame with fewer partitions than defaultParallelism is hash-
  repartitioned up to it (keyed form: no sortBeforeRepartition local sort);
- a frame already at/above defaultParallelism passes through UNTOUCHED
  (the no-op-at-real-scale guarantee — at 100 TB the input arrives with
  thousands of splits and the helper must add nothing);
- SPARK_GRAFT_WIDEN_SCAN=off disables widening entirely (the A/B switch);
- widening never changes the rows, only their placement.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from milvus_cdc_spark.partitioning import widen_small_scan


def test_widens_narrow_frame_to_default_parallelism(spark):
    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    wide = widen_small_scan(narrow, "id")
    assert wide.rdd.getNumPartitions() == target


def test_noop_on_already_wide_frame(spark):
    target = spark.sparkContext.defaultParallelism
    wide_in = spark.range(0, 1000, numPartitions=target)
    out = widen_small_scan(wide_in, "id")
    # Same plan object — no exchange inserted on well-split inputs.
    assert out is wide_in


def test_keyed_widening_is_hash_not_roundrobin(spark):
    narrow = spark.range(0, 1000).coalesce(1)
    plan = widen_small_scan(narrow, "id")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" in plan
    assert "roundrobinpartitioning" not in plan


def test_off_switch_disables(spark):
    narrow = spark.range(0, 100).coalesce(1)
    os.environ["SPARK_GRAFT_WIDEN_SCAN"] = "off"
    try:
        out = widen_small_scan(narrow, "id")
        assert out is narrow
    finally:
        os.environ.pop("SPARK_GRAFT_WIDEN_SCAN", None)


def test_rows_unchanged_by_widening(spark):
    narrow = (
        spark.range(0, 500)
        .withColumn("v", F.md5(F.col("id").cast("string")))
        .coalesce(1)
    )
    wide = widen_small_scan(narrow, "id")
    a = sorted(tuple(r) for r in narrow.collect())
    b = sorted(tuple(r) for r in wide.collect())
    assert a == b
