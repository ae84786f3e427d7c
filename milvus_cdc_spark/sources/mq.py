"""Broker-agnostic op-log stream dispatch (S5).

The reference hides the broker behind msgstream.Factory — config decides
whether Pulsar or Kafka backs the stream (server/configs/cdc.yaml:36-44:
exactly one of ``mq.pulsar`` / ``mq.kafka`` is configured;
core/reader/stream_creator.go consumes whichever the factory built).
Same contract here: a task's ``connect_params`` names one broker and
``read_oplog_stream`` routes to the matching source builder; both
sources share the JSON op-event envelope and parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from milvus_cdc_spark.sources import filebroker, kafka, pulsar


def read_oplog_stream(
    spark: SparkSession, connect_params: dict, topic: str, **kwargs
) -> DataFrame:
    """Route to the configured broker: ``{"pulsar": {...}}``,
    ``{"kafka": {...}}``, or ``{"file": {...}}`` (exactly one, like
    cdc.yaml's mq block; ``file`` is the executed directory-backed
    emulator sharing the envelope parse with the broker arms)."""
    pulsar_cfg = connect_params.get("pulsar")
    kafka_cfg = connect_params.get("kafka")
    file_cfg = connect_params.get("file")
    n_cfg = sum(1 for c in (pulsar_cfg, kafka_cfg, file_cfg) if c)
    if n_cfg != 1:
        raise ValueError(
            "connect_params must configure exactly one of "
            "'pulsar', 'kafka', or 'file'"
        )
    if file_cfg:
        return filebroker.read_oplog_stream(
            spark,
            file_cfg["root"],
            topic,
            start_ts=file_cfg.get("start_ts"),
            **kwargs,
        )
    if pulsar_cfg:
        return pulsar.read_oplog_stream(
            spark,
            pulsar_cfg["address"],
            topic,
            admin_url=pulsar_cfg.get("webAddress"),
            tenant=pulsar_cfg.get("tenant", pulsar.DEFAULT_TENANT),
            namespace=pulsar_cfg.get("namespace", pulsar.DEFAULT_NAMESPACE),
            max_message_size=pulsar_cfg.get("maxMessageSize"),
            auth_plugin=pulsar_cfg.get("authPlugin"),
            auth_params=pulsar_cfg.get("authParams"),
            **kwargs,
        )
    return kafka.read_oplog_stream(spark, kafka_cfg["address"], topic, **kwargs)
