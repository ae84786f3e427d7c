"""Idempotent DDL (K2) + packer trigger policy (T5)."""

from __future__ import annotations

from milvus_cdc_spark.operators import ddl
from milvus_cdc_spark.streaming.packer import PackerPolicy


def test_ensure_table_idempotent(spark):
    name = "test_ddl_coll"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert ddl.ensure_table(spark, name, "pk BIGINT, v STRING") is True
    # second create takes the "skip ... has existed" path
    assert ddl.ensure_table(spark, name, "pk BIGINT, v STRING") is False
    assert ddl.drop_table_if_exists(spark, name) is True
    assert ddl.drop_table_if_exists(spark, name) is False


def test_apply_ddl_op_dispatch(spark):
    spark.sql("DROP TABLE IF EXISTS t_dispatch")
    op = {"op_type": "create_collection", "collection": "t_dispatch",
          "schema_ddl": "pk BIGINT"}
    assert ddl.apply_ddl_op(spark, op) == "created"
    assert ddl.apply_ddl_op(spark, op) == "skipped"
    assert ddl.apply_ddl_op(spark, {"op_type": "drop_collection",
                                    "collection": "t_dispatch"}) == "dropped"
    # flush now routes to LoadState (channel_writer.go:121 flush handler)
    assert ddl.apply_ddl_op(spark, {"op_type": "flush"}) == "flushed"
    # unknown op types still fall through
    assert ddl.apply_ddl_op(spark, {"op_type": "time_tick"}) == "ignored"


def test_packer_policy_thresholds():
    p = PackerPolicy()
    assert not p.should_flush(count=5, batch_bytes=100, elapsed_ms=100)
    assert p.should_flush(count=10, batch_bytes=100, elapsed_ms=100)       # count
    assert p.should_flush(count=1, batch_bytes=512 * 1024, elapsed_ms=0)   # bytes
    assert p.should_flush(count=1, batch_bytes=0, elapsed_ms=5000)         # timer
    assert p.should_flush(count=1, batch_bytes=0, elapsed_ms=0,
                          global_bytes=4 << 30)                            # memory


def test_packer_to_trigger_options():
    opts = PackerPolicy().to_trigger_options(avg_msg_bytes=64 * 1024)
    # 512KB / 64KB = 8 < 10 msgs → byte cap wins
    assert opts["maxOffsetsPerTrigger"] == "8"
    assert opts["processingTime"] == "5000 milliseconds"


def test_index_state_lifecycle(spark):
    """create/alter/drop index idempotence (channel_writer.go:121-124):
    describe-before-create skips, alter merges params, the registry
    answers the metric a search should use."""
    from milvus_cdc_spark.operators.ddl import IndexState, apply_ddl_op

    st = IndexState()
    mk = {"op_type": "create_index", "collection": "c", "field": "emb",
          "index_name": "ivf", "index_type": "IVF_SQ8", "metric_type": "L2",
          "params": {"nlist": 128}}
    assert apply_ddl_op(spark, mk, index=st) == "created"
    assert apply_ddl_op(spark, mk, index=st) == "skipped"
    assert st.metric_for("c", "emb") == "L2"
    alter = {"op_type": "alter_index", "collection": "c", "field": "emb",
             "index_name": "ivf", "params": {"nprobe": 8}}
    assert apply_ddl_op(spark, alter, index=st) == "updated"
    assert st.indexes[("c", "emb", "ivf")]["params"] == {"nlist": 128, "nprobe": 8}
    drop = {"op_type": "drop_index", "collection": "c", "field": "emb",
            "index_name": "ivf"}
    assert apply_ddl_op(spark, drop, index=st) == "dropped"
    assert apply_ddl_op(spark, drop, index=st) == "skipped"
    assert st.metric_for("c", "emb") is None


def test_load_state_lifecycle(spark):
    """load/release collection+partitions and flush markers
    (channel_writer.go:122-128): partition loads merge, releasing the
    last partition unloads, whole-collection load subsumes partitions."""
    from milvus_cdc_spark.operators.ddl import LoadState, apply_ddl_op

    st = LoadState()
    assert apply_ddl_op(
        spark, {"op_type": "load_partitions", "collection": "c",
                "partitions": ["p1", "p2"]}, load=st) == "created"
    assert st.is_loaded("c", "p1") and not st.is_loaded("c", "p9")
    # subset re-load is a skip; superset merges
    assert apply_ddl_op(
        spark, {"op_type": "load_partitions", "collection": "c",
                "partitions": ["p1"]}, load=st) == "skipped"
    assert apply_ddl_op(
        spark, {"op_type": "load_partitions", "collection": "c",
                "partitions": ["p3"]}, load=st) == "created"
    assert apply_ddl_op(
        spark, {"op_type": "release_partitions", "collection": "c",
                "partitions": ["p1", "p2", "p3"]}, load=st) == "dropped"
    assert not st.is_loaded("c")
    # whole-collection load covers any partition; repeat is a skip
    assert apply_ddl_op(
        spark, {"op_type": "load_collection", "collection": "c"},
        load=st) == "created"
    assert st.is_loaded("c", "anything")
    assert apply_ddl_op(
        spark, {"op_type": "load_collection", "collection": "c"},
        load=st) == "skipped"
    assert apply_ddl_op(
        spark, {"op_type": "release_collection", "collection": "c"},
        load=st) == "dropped"
    assert apply_ddl_op(
        spark, {"op_type": "flush", "collection": "c", "ts": 77},
        load=st) == "flushed"
    assert st.flushed["c"] == 77
