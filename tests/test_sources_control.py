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
