"""Kafka op-log source/sink builders (S5/S6, K3).

Reference: per-vchannel MQ consumption with seek positions
(core/reader/stream_creator.go:49-98) and the Kafka JSON sink
(core/writer/kafka_handler.go:282-324). In Spark the broker already
partitions; one readStream covers all topic-partitions, per-partition
ordering and offset tracking come from the source, and "seek" is the
``startingOffsets`` JSON built from the positions table.

No broker runs in the test container, so these builders are exercised by
unit tests on the option dicts + parsed schemas; the file-source pipeline
(streaming.pipeline) covers the execution path end-to-end.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark.streaming.pipeline import OPLOG_SCHEMA


def starting_offsets_json(topic: str, positions: dict[int, int] | None) -> str:
    """positions {partition → next offset} → startingOffsets JSON;
    'latest' when no checkpoint exists (stream_creator.go: seek vs latest)."""
    if not positions:
        return "latest"
    return json.dumps({topic: {str(p): o for p, o in positions.items()}})


def kafka_source_options(
    bootstrap: str, topic: str, positions: dict[int, int] | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting_offsets_json(topic, positions),
        # reference readChanLen/backpressure analog (T9): bound batch size
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_oplog_stream(
    spark: SparkSession, bootstrap: str, topic: str,
    positions: dict[int, int] | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka value (JSON op-event) → typed op-log stream."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap, topic, positions, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return parse_oplog_json(raw)


def parse_oplog_json(raw: DataFrame) -> DataFrame:
    """value bytes → op-log columns (works on batch or streaming frames)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), OPLOG_SCHEMA).alias("op")
    ).select("op.*")


def oplog_to_kafka_value(ops: DataFrame) -> DataFrame:
    """K3/K4 sink projection: one JSON value per op, keyed by vchannel so
    Kafka preserves per-channel order (the reference's per-channel serial
    apply queue K5 becomes broker-side partition ordering)."""
    cols = [f.split()[0] for f in OPLOG_SCHEMA.split(",")]
    return ops.select(
        F.col("vchannel").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c.strip()) for c in cols])).alias("value"),
    )
