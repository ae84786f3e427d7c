"""The CDC streaming pipeline — Structured Streaming re-expression of the
reference's dataflow core (SURVEY §2.9).

Reference shape: MQ pack → transform (filter / remap / ts repair) → per-
channel serial apply → position write-back
(core/reader/replicate_channel_manager.go handlePack →
core/writer/channel_writer.go → server/writer_callback.go).

Spark shape:

    readStream (file/Kafka source of op-events)
      → stateless transforms (whitelist, collection filter, remap)
      → foreachBatch:
          1. merge-apply the batch into the state table (idempotent,
             commutative: per-pk max of insert/delete ts — so replay,
             reordering, and at-least-once delivery all converge to the
             same state; this is what makes checkpoint-resume exactly-once
             *effectively*)
          2. write back positions (per-vchannel max ts) in the same batch,
             mirroring the reference's position-after-apply ordering
             (server/cdc_impl.go:1116-1173)

State storage here is parquet read-modify-write (the container has no
Delta); on a cluster the same foreachBatch body becomes a Delta MERGE and
the positions write shares the table transaction. The merge itself is a
DataFrame aggregate+join — no driver-side state, scales with pk
cardinality.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OPLOG_SCHEMA = (
    "ts bigint, op_type string, db string, collection string, partition string, "
    "vchannel string, pk bigint, num_rows bigint, seq bigint"
)

STATE_COLS = ["collection", "pk", "last_insert_ts", "last_delete_ts", "n_inserts"]


def batch_to_state(batch: DataFrame) -> DataFrame:
    """Collapse one microbatch to per-pk partial state."""
    # 'import' (bulk load, reference ImportMsg) carries rows exactly like
    # an insert for liveness purposes — both advance last_insert_ts
    is_ins = F.col("op_type").isin("insert", "import")
    return batch.groupBy("collection", "pk").agg(
        F.max(F.when(is_ins, F.col("ts"))).alias("last_insert_ts"),
        F.max(F.when(F.col("op_type") == "delete", F.col("ts"))).alias("last_delete_ts"),
        F.sum(F.when(is_ins, F.col("num_rows")).otherwise(F.lit(0))).alias("n_inserts"),
    )


def merge_state(existing: DataFrame, update: DataFrame) -> DataFrame:
    """Idempotent commutative merge: max timestamps, summed insert counts.

    Equivalent to ``MERGE INTO state USING update ON pk WHEN MATCHED
    UPDATE max(...)`` — expressed as union+re-aggregate so it needs no
    Delta. Catalyst plans partial+final agg; the shuffle carries one row
    per pk per side.
    """
    return (
        existing.select(*STATE_COLS)
        .unionByName(update.select(*STATE_COLS))
        .groupBy("collection", "pk")
        .agg(
            F.max("last_insert_ts").alias("last_insert_ts"),
            F.max("last_delete_ts").alias("last_delete_ts"),
            F.sum("n_inserts").alias("n_inserts"),
        )
    )


def alive_view(state: DataFrame) -> DataFrame:
    """data_diff rule (main.go:160-174): alive iff max(ins) >= max(del)."""
    return state.filter(
        F.col("last_insert_ts").isNotNull()
        & (
            F.col("last_delete_ts").isNull()
            | (F.col("last_insert_ts") >= F.col("last_delete_ts"))
        )
    )


class CdcApplyPipeline:
    """File-source CDC pipeline with parquet state + positions tables.

    ``run_available_now`` drains everything currently in ``source_dir``
    (trigger availableNow) — the batch-correctness path the suite checks;
    a production deployment keeps the same query running continuously.
    """

    def __init__(self, spark: SparkSession, source_dir: str, work_dir: str,
                 collections: list[str] | None = None,
                 mirror: bool = False):
        self.spark = spark
        self.source_dir = source_dir
        self.state_dir = os.path.join(work_dir, "state")
        self.positions_dir = os.path.join(work_dir, "positions")
        self.checkpoint_dir = os.path.join(work_dir, "checkpoint")
        self.collections = collections
        self._state_version = 0
        # optional downstream mirror (the Kafka-sink analog, K3): ops are
        # monotonic-ts-repaired (T2) before emission, exactly the
        # reference's handlePack → sink ordering
        self.mirror_dir = os.path.join(work_dir, "mirror") if mirror else None
        self._repair = None
        if mirror:
            from milvus_cdc_spark.streaming.repair import MonotonicRepairStage

            self._repair = MonotonicRepairStage(spark, work_dir)

    # -- state table ------------------------------------------------------
    def _state_path(self, version: int) -> str:
        return os.path.join(self.state_dir, f"v{version}")

    def read_state(self) -> DataFrame:
        if self._state_version == 0:
            return self.spark.createDataFrame(
                [],
                "collection string, pk bigint, last_insert_ts bigint, "
                "last_delete_ts bigint, n_inserts bigint",
            )
        return self.spark.read.parquet(self._state_path(self._state_version))

    def _write_state(self, df: DataFrame) -> None:
        # versioned write-then-swap: parquet stand-in for a Delta MERGE commit
        self._state_version += 1
        df.write.mode("overwrite").parquet(self._state_path(self._state_version))

    # -- foreachBatch body ------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from milvus_cdc_spark.operators import filters

        # one materialization for the whole body: the state merge, mirror,
        # and positions writes are separate actions — without the persist
        # each re-scans the source batch (and re-fires observe() counters)
        batch.persist()
        try:
            self._apply_batch_inner(batch, batch_id)
        finally:
            batch.unpersist()

    def _apply_batch_inner(self, batch: DataFrame, batch_id: int) -> None:
        from milvus_cdc_spark.operators import filters

        ops = filters.msg_type_whitelist(batch)
        if self.collections:
            ops = ops.filter(filters.collection_filter_predicate(self.collections))
        update = batch_to_state(ops)
        merged = merge_state(self.read_state(), update)
        self._write_state(merged)
        if self._repair is not None:
            repaired = self._repair.process(ops).withColumn(
                "batch_id", F.lit(batch_id)
            )
            repaired.write.mode("append").parquet(self.mirror_dir)
        # position write-back AFTER successful apply (reference ordering)
        positions = ops.groupBy("vchannel").agg(
            F.max("ts").alias("position_ts"), F.count("*").alias("n_msgs")
        ).withColumn("batch_id", F.lit(batch_id))
        positions.write.mode("append").parquet(self.positions_dir)

    # -- run --------------------------------------------------------------
    def run_available_now(self) -> None:
        stream = (
            self.spark.readStream.schema(OPLOG_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(self.source_dir)
            # Spark-native counters (reference metrics.go replicate_data_cnt
            # / _size): observed per microbatch, surfaced in progress events
            # as observedMetrics["apply_metrics"] — no hand-kept atomics
            .observe(
                "apply_metrics",
                F.count(F.lit(1)).alias("ops"),
                F.sum("num_rows").alias("payload_rows"),
            )
        )
        query = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        observed = []
        for p in query.recentProgress:
            m = p.get("observedMetrics", {}).get("apply_metrics")
            if m is not None:
                observed.append(m.asDict() if hasattr(m, "asDict") else dict(m))
        self.last_observed = observed

    def alive(self) -> DataFrame:
        return alive_view(self.read_state())

    def compact_positions(self) -> None:
        """Rewrite the append-per-batch positions table as one file per
        vchannel-summary — the small-file compaction a long-running task
        schedules periodically (every batch appends a few-KB file; at
        500 ms triggers that is ~170k files/day unscheduled)."""
        try:
            pos = self.spark.read.parquet(self.positions_dir)
        except Exception:
            return
        latest = pos.groupBy("vchannel").agg(
            F.max("position_ts").alias("position_ts"),
            F.sum("n_msgs").alias("n_msgs"),
            F.max("batch_id").alias("batch_id"),
        )
        tmp_dir = self.positions_dir + ".compact"
        latest.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        import shutil

        shutil.rmtree(self.positions_dir)
        os.rename(tmp_dir, self.positions_dir)

    def positions(self) -> DataFrame:
        """Latest position per vchannel (K6 checkpoint semantics)."""
        try:
            pos = self.spark.read.parquet(self.positions_dir)
        except Exception:
            return self.spark.createDataFrame(
                [], "vchannel string, position_ts bigint"
            )
        return pos.groupBy("vchannel").agg(F.max("position_ts").alias("position_ts"))
