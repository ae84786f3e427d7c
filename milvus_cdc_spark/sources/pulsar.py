"""Pulsar op-log source builders (S5) — the reference's DEFAULT broker.

Reference: the MQ factory consumes either Pulsar or Kafka
(core/reader/stream_creator.go:57-121 builds a consumer per pchannel and
seeks it to the checkpointed MsgPosition or subscribes at Latest;
server/configs/cdc.yaml:36-44 carries the pulsar block: address,
webAddress, maxMessageSize, tenant, namespace, authPlugin/authParams).

Spark shape: the StreamNative pulsar-spark connector exposes the same
surface declaratively — ``format("pulsar")`` with ``service.url`` /
``admin.url`` / ``topic`` options, and "seek" is the ``startingOffsets``
JSON mapping each topic to a serialized MessageId. The reference's seek
position is exactly a Pulsar MessageIdData (ledgerId, entryId, partition,
batch_index — MsgPosition.MsgID carries its protobuf bytes), so this
module ships a deterministic MessageIdData codec: positions checkpointed
by the pipeline round-trip into connector offsets byte-for-byte.

No broker or connector jar lives in the test container, so — exactly like
``sources.kafka`` — the builders are exercised as option dicts + codec
unit tests, while the executed streaming path is covered end-to-end by
the file-source pipeline (streaming.pipeline).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

#: cdc.yaml defaults (server/configs/cdc.yaml:42-43).
DEFAULT_TENANT = "public"
DEFAULT_NAMESPACE = "default"


def qualified_topic(
    topic: str,
    tenant: str = DEFAULT_TENANT,
    namespace: str = DEFAULT_NAMESPACE,
) -> str:
    """Short channel name → fully-qualified persistent topic
    (``persistent://tenant/namespace/topic``); already-qualified names
    pass through. The reference's pchannels are short names resolved
    against the configured tenant/namespace."""
    if "://" in topic:
        return topic
    return f"persistent://{tenant}/{namespace}/{topic}"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_message_id(
    ledger_id: int, entry_id: int, partition: int = -1, batch_index: int = -1
) -> bytes:
    """Serialize a Pulsar MessageIdData (the wire form the reference's
    seek position carries in MsgPosition.MsgID): proto2 fields 1..4 =
    ledgerId, entryId, partition, batch_index, varint-encoded; the -1
    defaults are omitted, matching Pulsar's own encoder."""
    out = b"\x08" + _varint(ledger_id) + b"\x10" + _varint(entry_id)
    if partition >= 0:
        out += b"\x18" + _varint(partition)
    if batch_index >= 0:
        out += b"\x20" + _varint(batch_index)
    return out


def decode_message_id(data: bytes) -> dict[str, int]:
    """Inverse of :func:`encode_message_id` (positions read back from a
    checkpoint → human-readable seek info, the GetPosition surface)."""
    fields = {1: "ledger_id", 2: "entry_id", 3: "partition", 4: "batch_index"}
    out = {"ledger_id": 0, "entry_id": 0, "partition": -1, "batch_index": -1}
    i = 0
    while i < len(data):
        key = data[i]
        i += 1
        shift, val = 0, 0
        while True:
            b = data[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        name = fields.get(key >> 3)
        if name:
            out[name] = val
    return out


def starting_message_ids_json(topic: str, message_id: bytes | None) -> str:
    """Seek-vs-latest (stream_creator.go:115-118: no position →
    SubscriptionPositionLatest): a checkpointed MessageId becomes the
    connector's per-topic offsets JSON (serialized MessageIdData as a
    signed-byte array, the pulsar-spark wire format)."""
    if not message_id:
        return "latest"
    signed = [b - 256 if b > 127 else b for b in message_id]
    return json.dumps({topic: signed})


def pulsar_source_options(
    service_url: str,
    topic: str,
    admin_url: str | None = None,
    message_id: bytes | None = None,
    tenant: str = DEFAULT_TENANT,
    namespace: str = DEFAULT_NAMESPACE,
    max_message_size: int | None = None,
    auth_plugin: str | None = None,
    auth_params: str | None = None,
    receiver_queue_size: int | None = None,
) -> dict[str, str]:
    """Option dict mirroring cdc.yaml's pulsar block: address →
    service.url, webAddress → admin.url, tenant/namespace qualify the
    topic, authPlugin/authParams pass through as client auth, and
    receiver_queue_size is the readChanLen backpressure analog (T9)."""
    full_topic = qualified_topic(topic, tenant, namespace)
    opts = {
        "service.url": service_url,
        "topic": full_topic,
        "startingOffsets": starting_message_ids_json(full_topic, message_id),
        "failOnDataLoss": "false",
    }
    if admin_url:
        opts["admin.url"] = admin_url
    if max_message_size:
        opts["pulsar.client.maxMessageSize"] = str(max_message_size)
    if auth_plugin:
        opts["pulsar.client.authPluginClassName"] = auth_plugin
        opts["pulsar.client.authParams"] = auth_params or ""
    if receiver_queue_size:
        opts["pulsar.consumer.receiverQueueSize"] = str(receiver_queue_size)
    return opts


def read_oplog_stream(
    spark: SparkSession,
    service_url: str,
    topic: str,
    admin_url: str | None = None,
    message_id: bytes | None = None,
    **kwargs,
) -> DataFrame:
    """Pulsar value (JSON op-event) → typed op-log stream; parsing is
    shared with the Kafka source (one envelope, two brokers — the
    reference likewise hides the broker behind msgstream.Factory)."""
    from milvus_cdc_spark.sources.kafka import parse_oplog_json

    reader = spark.readStream.format("pulsar")
    for k, v in pulsar_source_options(
        service_url, topic, admin_url=admin_url, message_id=message_id, **kwargs
    ).items():
        reader = reader.option(k, v)
    return parse_oplog_json(reader.load())
