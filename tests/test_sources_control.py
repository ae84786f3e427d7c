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


def test_pulsar_message_id_codec_roundtrip():
    """MessageIdData protobuf codec: encode/decode are inverse, defaults
    (-1 partition/batch) are omitted on the wire like Pulsar's encoder,
    and multi-byte varints survive."""
    from milvus_cdc_spark.sources import pulsar

    for lid, eid, part, bidx in [
        (0, 0, -1, -1),
        (8, 11, -1, -1),
        (300, 2, 4, -1),          # ledgerId needs a 2-byte varint
        (2**40, 2**21, 65, 300),  # big ids, batch index present
    ]:
        data = pulsar.encode_message_id(lid, eid, part, bidx)
        got = pulsar.decode_message_id(data)
        assert got == {
            "ledger_id": lid, "entry_id": eid,
            "partition": part, "batch_index": bidx,
        }
    # canonical small id: field tags 1..2, single-byte varints
    assert pulsar.encode_message_id(8, 11) == b"\x08\x08\x10\x0b"


def test_pulsar_starting_offsets_seek_vs_latest():
    from milvus_cdc_spark.sources import pulsar

    assert pulsar.starting_message_ids_json("t", None) == "latest"
    mid = pulsar.encode_message_id(8, 11)
    s = json.loads(pulsar.starting_message_ids_json("persistent://a/b/t", mid))
    assert s == {"persistent://a/b/t": [8, 8, 16, 11]}
    # bytes above 127 encode as signed (java byte[] wire form)
    mid2 = pulsar.encode_message_id(300, 2)
    vals = json.loads(pulsar.starting_message_ids_json("t", mid2))["t"]
    assert vals[1] == -84 and all(-128 <= v <= 127 for v in vals)


def test_pulsar_source_options_cdc_yaml_parity():
    """Option builder mirrors cdc.yaml's pulsar block (address,
    webAddress, tenant/namespace, maxMessageSize, auth)."""
    from milvus_cdc_spark.sources import pulsar

    opts = pulsar.pulsar_source_options(
        "pulsar://localhost:6650",
        "by-dev-rootcoord-dml_0",
        admin_url="http://localhost:80",
        tenant="public",
        namespace="default",
        max_message_size=5242880,
        auth_plugin="org.apache.pulsar.client.impl.auth.AuthenticationToken",
        auth_params="token:xxx",
        receiver_queue_size=4,
    )
    assert opts["service.url"] == "pulsar://localhost:6650"
    assert opts["admin.url"] == "http://localhost:80"
    assert opts["topic"] == "persistent://public/default/by-dev-rootcoord-dml_0"
    assert opts["startingOffsets"] == "latest"
    assert opts["pulsar.client.maxMessageSize"] == "5242880"
    assert opts["pulsar.client.authPluginClassName"].endswith("AuthenticationToken")
    assert opts["pulsar.consumer.receiverQueueSize"] == "4"
    # a seek position lands as the per-topic offsets JSON
    seek = pulsar.pulsar_source_options(
        "pulsar://h:6650", "t", message_id=pulsar.encode_message_id(8, 11)
    )
    assert json.loads(seek["startingOffsets"]) == {
        "persistent://public/default/t": [8, 8, 16, 11]
    }


def test_mq_dispatch_picks_exactly_one_broker():
    """Shared dispatch: exactly one of pulsar/kafka must be configured
    (cdc.yaml mq block); wrong shapes raise before any stream is built."""
    import pytest

    from milvus_cdc_spark.sources import mq

    with pytest.raises(ValueError):
        mq.read_oplog_stream(None, {}, "t")
    with pytest.raises(ValueError):
        mq.read_oplog_stream(
            None, {"pulsar": {"address": "p"}, "kafka": {"address": "k"}}, "t"
        )


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
