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


def test_off_switch_disables(spark, monkeypatch):
    narrow = spark.range(0, 100).coalesce(1)
    # monkeypatch restores any pre-existing value after the test
    # (a bare os.environ.pop clobbered it for the session — ADVICE r14)
    monkeypatch.setenv("SPARK_GRAFT_WIDEN_SCAN", "off")
    out = widen_small_scan(narrow, "id")
    assert out is narrow


def test_probe_memoized_per_file_set(spark, tmp_path, monkeypatch):
    """r15: the plan→RDD partition probe is paid once per (session,
    input-file-set) — a second widen over the same scanned files must
    reuse the memo (no second physical-planning pass), and the memoized
    decision must match the direct probe's."""
    from milvus_cdc_spark import partitioning

    path = str(tmp_path / "narrow.parquet")
    spark.range(0, 200).coalesce(1).write.parquet(path)
    calls = {"n": 0}
    real_probe = partitioning._plan_partitions

    def counting_probe(df):
        calls["n"] += 1
        return real_probe(df)

    monkeypatch.setattr(partitioning, "_plan_partitions", counting_probe)
    monkeypatch.setattr(partitioning, "_PROBE_CACHE", {})
    target = spark.sparkContext.defaultParallelism
    first = widen_small_scan(spark.read.parquet(path), "id")
    assert calls["n"] == 1
    assert first.rdd.getNumPartitions() == target
    # fresh frame, same files: memo hit, same widening decision
    second = widen_small_scan(spark.read.parquet(path), "id")
    assert calls["n"] == 1
    assert second.rdd.getNumPartitions() == target
    # frames with no input files still probe directly (no stale reuse)
    widen_small_scan(spark.range(0, 10).coalesce(1), "id")
    assert calls["n"] == 2


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
