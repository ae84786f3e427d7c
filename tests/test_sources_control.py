"""Kafka source/sink builders + error quarantine."""

from __future__ import annotations

import json

from milvus_cdc_spark.control.quarantine import ErrorQuarantine
from milvus_cdc_spark.sources import kafka


def test_starting_offsets_seek_vs_latest():
    assert kafka.starting_offsets_json("t", None) == "latest"
    s = kafka.starting_offsets_json("t", {0: 42, 1: 7})
    assert json.loads(s) == {"t": {"0": 42, "1": 7}}


def test_kafka_source_options_backpressure():
    opts = kafka.kafka_source_options("broker:9092", "oplog", None, 1000)
    assert opts["maxOffsetsPerTrigger"] == "1000"
    assert opts["subscribe"] == "oplog"


def test_oplog_kafka_roundtrip(spark):
    """oplog → kafka value JSON → parsed oplog must be lossless."""
    ops = spark.createDataFrame(
        [(1, "insert", "db", "c", "_default", "ch_0", 10, 1, 0)],
        kafka.OPLOG_SCHEMA,
    )
    encoded = kafka.oplog_to_kafka_value(ops)
    assert encoded.columns == ["key", "value"]
    decoded = kafka.parse_oplog_json(encoded.selectExpr("CAST(value AS BINARY) AS value"))
    assert [tuple(r) for r in decoded.collect()] == [tuple(r) for r in ops.collect()]


def test_error_quarantine_trips_in_window():
    q = ErrorQuarantine(max_errors=3, window_sec=60)
    q.record("e1", now=0.0)
    q.record("e2", now=1.0)
    assert not q.tripped(now=1.0)
    q.record("e3", now=2.0)
    assert q.tripped(now=2.0)
    # outside the window the counter decays
    assert not q.tripped(now=100.0)
    assert q.last_reason == "e3"


def test_pipeline_listener_metrics_and_quarantine(spark):
    """Listener observes real streaming progress (rows/batches) and feeds
    failures into the quarantine with the auto-pause hook."""
    import tempfile
    import time
    import uuid

    from milvus_cdc_spark.control.listener import PipelineListener

    tripped = []
    listener = PipelineListener(on_trip=lambda name, why: tripped.append((name, why)),
                                max_errors=1)
    spark.streams.addListener(listener)
    try:
        tmp = tempfile.mkdtemp(prefix="listen_")
        spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "k bigint, v bigint"
        ).repartition(2).write.mode("overwrite").parquet(tmp + "/src")
        name = f"ok_{uuid.uuid4().hex[:6]}"
        q = (
            spark.readStream.schema("k bigint, v bigint")
            .option("maxFilesPerTrigger", 1).parquet(tmp + "/src")
            .writeStream.format("memory").queryName(name)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

        def fail_batch(batch, batch_id):
            raise RuntimeError("sink exploded")

        q2 = (
            spark.readStream.schema("k bigint, v bigint")
            .option("maxFilesPerTrigger", 1).parquet(tmp + "/src")
            .writeStream.foreachBatch(fail_batch)
            .option("checkpointLocation", tmp + "/ckpt")
            .trigger(availableNow=True).start()
        )
        try:
            q2.awaitTermination()
        except Exception:
            pass
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and not tripped:
            time.sleep(0.5)
        assert listener.metrics[name]["num_input_rows"] == 20
        assert listener.metrics[name]["num_batches"] >= 2
        assert tripped and "sink exploded" in tripped[0][1]
    finally:
        spark.streams.removeListener(listener)


def test_credentials_scrubbed_on_read(spark, tmp_path):
    """get/list mask secret-bearing connect params (base.go:59-74) while
    the persisted spec keeps them for restart."""
    import json

    from milvus_cdc_spark.control.tasks import TaskRegistry

    reg = TaskRegistry(spark, str(tmp_path))
    spec = reg.create(
        "/dev/null", ["c_scrub"],
        connect_params={"bootstrap": "k:9092", "sasl.password": "hunter2"},
    )
    got = reg.get(spec.task_id)
    assert got["connect_params"]["sasl.password"] == "******"
    assert got["connect_params"]["bootstrap"] == "k:9092"
    assert reg.list()[0]["connect_params"]["sasl.password"] == "******"
    # persisted meta retains the real value for resume
    with open(reg.meta_path) as f:
        assert json.load(f)[spec.task_id]["connect_params"]["sasl.password"] == "hunter2"
