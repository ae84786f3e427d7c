"""Streaming pipeline, monotonic repair, barrier, and control-plane tests."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import catalog, oplog
from milvus_cdc_spark.control.tasks import (
    DuplicateCollectionError,
    TaskRegistry,
)
from milvus_cdc_spark.operators import apply as apply_op
from milvus_cdc_spark.streaming import repair
from milvus_cdc_spark.streaming.pipeline import CdcApplyPipeline


@pytest.fixture(scope="module")
def oplog_dir(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="test_oplog_")
    ops = oplog.derive_oplog(catalog.load_table(spark, sf_dir, "lineitem"))
    ops.repartition(6).write.mode("overwrite").parquet(tmp + "/files")
    return tmp + "/files"


def test_streaming_apply_converges_to_batch_replay(spark, sf_dir, oplog_dir):
    """Incremental microbatch apply == full batch replay (the reference's
    'downstream equals upstream' oracle)."""
    work = tempfile.mkdtemp(prefix="test_work_")
    pipe = CdcApplyPipeline(spark, oplog_dir, work)
    pipe.run_available_now()
    got = {
        (r.collection, r.pk): r.last_insert_ts for r in pipe.alive().collect()
    }
    ops = oplog.derive_oplog(catalog.load_table(spark, sf_dir, "lineitem"))
    want = {
        (r.collection, r.pk): r.last_insert_ts
        for r in apply_op.replay_alive(ops).collect()
    }
    assert got == want


def test_streaming_apply_resume_is_idempotent(spark, oplog_dir):
    """Re-running with the same checkpoint must be a no-op (T6/T7)."""
    work = tempfile.mkdtemp(prefix="test_resume_")
    pipe = CdcApplyPipeline(spark, oplog_dir, work)
    pipe.run_available_now()
    before = sorted(
        (r.collection, r.pk) for r in pipe.alive().collect()
    )
    pipe.run_available_now()  # checkpoint says: nothing new
    after = sorted((r.collection, r.pk) for r in pipe.alive().collect())
    assert before == after


def test_monotonic_repair_stage(spark):
    stage = repair.MonotonicRepairStage(spark, tempfile.mkdtemp(prefix="rep_"))
    b1 = spark.createDataFrame(
        [("ch", 100), ("ch", 200)], "vchannel string, ts bigint"
    )
    out1 = stage.process(b1).collect()
    assert {r.ts: r.repaired_ts for r in out1} == {100: 100, 200: 200}
    # second batch regresses below channel max (200) → rebased above it
    b2 = spark.createDataFrame(
        [("ch", 50), ("ch", 150), ("ch", 300)], "vchannel string, ts bigint"
    )
    out2 = {r.ts: r.repaired_ts for r in stage.process(b2).collect()}
    assert out2[300] == 300  # already monotonic
    assert out2[50] == 201  # dense_rank 1 over base 200
    assert out2[150] == 202
    # channel max advanced
    assert stage.read_channel_max().collect()[0].max_ts == 300


def test_timetick_due(spark):
    state = spark.createDataFrame(
        [("a", 1000), ("b", 1400)], "vchannel string, last_sent_ts bigint"
    )
    due = repair.timetick_due(state, now_ts=1500, tt_interval=500)
    assert {r.vchannel for r in due.collect()} == {"a"}


def test_task_registry_lifecycle(spark, oplog_dir):
    root = tempfile.mkdtemp(prefix="tasks_")
    reg = TaskRegistry(spark, root)
    resp = reg.handle(
        {"request_type": "create",
         "request_data": {"source_dir": oplog_dir, "collections": ["coll_0"]}}
    )
    tid = resp["task_id"]
    # duplicate guard
    with pytest.raises(DuplicateCollectionError):
        reg.create(oplog_dir, ["coll_0", "coll_9"])
    reg.start(tid)
    assert reg.get(tid)["state"] == "running"
    # only coll_0 made it through the collection filter
    colls = {r.collection for r in reg.pipelines[tid].alive().collect()}
    assert colls == {"coll_0"}
    # positions exist and are base64-encoded
    pos = reg.handle({"request_type": "position", "request_data": {"task_id": tid}})
    assert pos["positions"] and all(p["encoded"] for p in pos["positions"])
    reg.pause(tid)
    assert reg.get(tid)["state"] == "paused"
    reg.resume(tid)
    assert reg.get(tid)["state"] == "running"
    # registry survives restart (ReloadTask)
    reg2 = TaskRegistry(spark, root)
    assert reg2.get(tid)["state"] == "running"
    reg2.delete(tid)
    assert reg2.list() == []


def test_streaming_barrier(spark):
    """Drop-barrier as a real streaming aggregate over a memory-ish source:
    use a rate-limited file stream of drop signals."""
    import uuid

    from milvus_cdc_spark.streaming.state import barrier_stream

    tmp = tempfile.mkdtemp(prefix="barrier_")
    signals = spark.createDataFrame(
        [(1, "ch_0"), (1, "ch_1"), (2, "ch_0")], "object_id bigint, vchannel string"
    )
    signals.repartition(3).write.mode("overwrite").parquet(tmp + "/sig")
    stream = (
        spark.readStream.schema("object_id bigint, vchannel string")
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp + "/sig")
    )
    agg = barrier_stream(stream, expected=2)
    sink = f"bar_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = {r.object_id: r.is_ready for r in spark.table(sink).collect()}
    assert res == {1: True, 2: False}
