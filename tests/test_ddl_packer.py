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
    assert ddl.apply_ddl_op(spark, {"op_type": "flush"}) == "ignored"


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
