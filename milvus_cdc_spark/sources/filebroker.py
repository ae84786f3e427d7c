"""Directory-backed broker emulator: the third arm of the S5 dispatch.

The container has no Kafka/Pulsar to run the real connectors against
(their option surfaces are pinned by recording-reader contract tests);
this source gives the SHARED half of those paths — the JSON op-event
envelope parse (`sources.kafka.parse_oplog_json`, the same expression
the kafka/pulsar `load()` output feeds) and the seek-strictly-after
position contract (msg_count main.go:294-301) — a fully EXECUTED
streaming path: a topic is a directory of text files, each line one
broker value. What a broker would add (offset tracking, partition
ordering) Spark's file source supplies with its own file-based
checkpointing; what the envelope/seek logic does is identical code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark.sources.kafka import parse_oplog_json


def topic_dir(root: str, topic: str) -> str:
    return f"{root.rstrip('/')}/{topic}"


def read_oplog_stream(
    spark: SparkSession,
    root: str,
    topic: str,
    start_ts: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Text-file topic → typed op-log stream through the SAME envelope
    parse the Kafka/Pulsar arms use. ``start_ts`` seeks strictly past a
    stored position (ops with ts <= start_ts were already applied)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(topic_dir(root, topic))
    ops = parse_oplog_json(raw.select(F.col("value")))
    if start_ts is not None:
        ops = ops.filter(F.col("ts") > F.lit(int(start_ts)))
    return ops
