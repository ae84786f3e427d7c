"""cdc.yaml server-config loader — the yaml_config analog.

Reference: server/tool/yaml_config.go loads server/configs/cdc.yaml for
the offline tools; server/main.go feeds the same file to the running
service. A user switching engines brings that file unchanged: this
module maps it onto the engine's structures — the mq block becomes the
``connect_params`` dict ``sources.mq.read_oplog_stream`` dispatches on,
``readChanLen`` becomes the backpressure option (T9), and the
etcd/meta-store sections are carried as metadata (this engine's state
lives in parquet manifests, not etcd — documented, not silently
dropped).

PyYAML is env-gated like every optional dependency: the loader raises a
clear ImportError if the library is absent rather than failing deep in
a parse.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CdcServerConfig:
    address: str = "0.0.0.0:8444"
    max_task_num: int = 100
    meta_store_type: str = "etcd"
    meta_root_path: str = "cdc-by-dev"
    source_etcd_address: tuple[str, ...] = ()
    source_root_path: str = "by-dev"
    meta_sub_path: str = "meta"
    read_chan_len: int = 10
    default_partition_name: str = "_default"
    replicate_chan: str = ""
    #: exactly one broker block, shaped for sources.mq.read_oplog_stream
    connect_params: dict = field(default_factory=dict)
    max_name_length: int = 256
    batch_mode: bool = False


def load_cdc_yaml(path: str) -> CdcServerConfig:
    """Parse a reference-format cdc.yaml into :class:`CdcServerConfig`.

    The mq block: ``sourceConfig.pulsar`` and ``sourceConfig.kafka`` —
    exactly one must be present (the reference's own constraint,
    config/config.go MQConfig validation); the chosen block passes
    through verbatim as ``connect_params`` so downstream option
    builders see the native field names (address, webAddress, tenant,
    namespace, maxMessageSize, authPlugin, authParams).
    """
    try:
        import yaml
    except ImportError as e:  # pragma: no cover - env-gated
        raise ImportError(
            "cdc.yaml loading needs PyYAML; install pyyaml or build the "
            "CdcServerConfig directly"
        ) from e

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    meta = raw.get("metaStoreConfig") or {}
    src = raw.get("sourceConfig") or {}
    src_etcd = src.get("etcd") or {}

    pulsar_cfg = src.get("pulsar")
    kafka_cfg = src.get("kafka")
    if bool(pulsar_cfg) == bool(kafka_cfg):
        raise ValueError(
            "cdc.yaml sourceConfig must configure exactly one of "
            "'pulsar' or 'kafka'"
        )
    connect = (
        {"pulsar": pulsar_cfg} if pulsar_cfg else {"kafka": kafka_cfg}
    )

    return CdcServerConfig(
        address=raw.get("address", CdcServerConfig.address),
        max_task_num=int(raw.get("maxTaskNum", CdcServerConfig.max_task_num)),
        meta_store_type=meta.get("storeType", CdcServerConfig.meta_store_type),
        meta_root_path=meta.get("rootPath", CdcServerConfig.meta_root_path),
        source_etcd_address=tuple(src_etcd.get("address") or ()),
        source_root_path=src_etcd.get(
            "rootPath", CdcServerConfig.source_root_path
        ),
        meta_sub_path=src_etcd.get("metaSubPath", CdcServerConfig.meta_sub_path),
        read_chan_len=int(src.get("readChanLen", CdcServerConfig.read_chan_len)),
        default_partition_name=src.get(
            "defaultPartitionName", CdcServerConfig.default_partition_name
        ),
        replicate_chan=src.get("replicateChan", ""),
        connect_params=connect,
        max_name_length=int(
            raw.get("maxNameLength", CdcServerConfig.max_name_length)
        ),
        batch_mode=bool(raw.get("batchMode", False)),
    )


def reader_options(cfg: CdcServerConfig, topic: str) -> dict[str, str]:
    """The Structured Streaming source options the config resolves to —
    broker-specific builders applied to the chosen block, with
    ``readChanLen`` as the per-trigger bound (T9 backpressure)."""
    if "pulsar" in cfg.connect_params:
        from milvus_cdc_spark.sources.pulsar import (
            DEFAULT_NAMESPACE,
            DEFAULT_TENANT,
            pulsar_source_options,
        )

        p = cfg.connect_params["pulsar"]
        return pulsar_source_options(
            p["address"],
            topic,
            admin_url=p.get("webAddress"),
            tenant=p.get("tenant", DEFAULT_TENANT),
            namespace=p.get("namespace", DEFAULT_NAMESPACE),
            max_message_size=p.get("maxMessageSize"),
            auth_plugin=p.get("authPlugin"),
            auth_params=p.get("authParams"),
            receiver_queue_size=cfg.read_chan_len,
        )
    from milvus_cdc_spark.sources.kafka import kafka_source_options

    k = cfg.connect_params["kafka"]
    return kafka_source_options(
        k["address"], topic, max_offsets_per_trigger=cfg.read_chan_len
    )
