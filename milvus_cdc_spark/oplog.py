"""Canonical CDC op-event model.

The reference's unit of data is a MsgPack of timestamped messages
(Insert/Delete/Drop…/TimeTick) per virtual channel
(core/reader/stream_creator.go:57-81, core/api/param.go:52-80). Flattened to
rows, that is one op-event per row:

    ts BIGINT (hybrid TSO: physical_ms << 18 | logical), op_type STRING,
    db STRING, collection STRING, partition STRING, vchannel STRING,
    pk BIGINT, num_rows BIGINT, seq BIGINT

For correctness testing the op-log is *derived deterministically* from the
driver's ``lineitem`` table with engine-portable expressions (md5 coin flips,
epoch-ms timestamps), so a DuckDB oracle can derive the identical log and both
engines replay it to the same answer.

Scale notes: the derivation is a pure projection — no shuffle, fully
pipelined in whole-stage codegen, safe at any scale. Collision-heavy pk
choice (l_partkey-based) deliberately creates multi-op histories per pk so
the replay aggregation is non-trivial. The one local-fixture caveat: the
projection's md5/concat/timestamp chain is expression-dense, and a
single-row-group fixture file scans as ONE task, so the whole derivation
(plus the map-side partial aggregate of whatever consumes it) serializes
on one core — ``partitioning.widen_small_scan`` guards that (no-op at
real scale, where the input arrives with >= cores splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.partitioning import widen_small_scan

# Share of ops that are deletes: first md5 hex nibble in 0..3 → 4/16 = 25 %.
_DELETE_NIBBLES = ("0", "1", "2", "3")

#: Number of virtual channels an op-log is sharded over (reference: N
#: vchannels per collection, stream_creator.go:204-218).
N_VCHANNELS = 4


def derive_oplog(lineitem: DataFrame, widen: bool = False) -> DataFrame:
    """Derive the canonical op-event log from ``lineitem``.

    - pk collides across orders (partkey-based) so pks accumulate histories;
    - ts is hybrid-TSO-style: shipdate epoch-ms << 18, plus a per-row
      logical component so ties are rare but possible;
    - op_type is an md5 coin flip — deterministic and portable.

    ``widen=True`` hash-repartitions the input up to the session's core
    count BEFORE the projection when its scan is under-parallelized
    (partitioning.widen_small_scan; no-op at real scale). OPT-IN per call
    site, not blanket: the r14 in-JVM interleaved A/B over all 22 batch
    consumers measured the heavy replay/consistency aggregations at
    −15..−46 % (the md5/concat projection plus the downstream map-side
    partial aggregate otherwise serialize inside the single-split scan
    stage) but the light projection-only consumers (argmax, envelope
    serde, remap routing) at +0.2-0.5 s — the extra exchange plus the
    plan→RDD partition probe costs more than their derivation work.

    r15 re-decided the four closest losers AFTER the partition probe was
    memoized (r14 verdict #6 suggested the probe cost might flip them):
    ignore_growing_read 1.45, dispatcher_routing 1.35,
    filtered_oplog_counts 1.09, begin_ts_repair 1.49 (interleaved A/B,
    4 pairs each at sf0.1) — the exchange itself, not the probe, is the
    cost; all 13 losers stay unwidened.
    """
    if widen:
        lineitem = widen_small_scan(lineitem, "l_orderkey", "l_linenumber")
    pk = (F.col("l_partkey") * F.lit(100) + F.col("l_linenumber")).cast("bigint")
    ts = (
        F.shiftleft(F.unix_millis(F.col("l_shipdate")), 18)
        + (F.col("l_orderkey") % F.lit(262144))
    ).cast("bigint")
    op_type = F.when(
        F.substring(F.md5(pk.cast("string")), 1, 1).isin(*_DELETE_NIBBLES),
        F.lit("delete"),
    ).otherwise(F.lit("insert"))
    return lineitem.select(
        ts.alias("ts"),
        op_type.alias("op_type"),
        F.lit("default").alias("db"),
        F.concat(F.lit("coll_"), (F.col("l_suppkey") % F.lit(3)).cast("string")).alias(
            "collection"
        ),
        F.lit("_default").alias("partition"),
        F.concat(F.lit("ch_"), (pk % F.lit(N_VCHANNELS)).cast("string")).alias("vchannel"),
        pk.alias("pk"),
        F.lit(1).cast("bigint").alias("num_rows"),
        F.col("l_orderkey").alias("seq"),
    )


#: DuckDB SQL that derives the identical op-log from the ``lineitem`` view.
ORACLE_OPLOG_SQL = """
SELECT
  (epoch_ms(l_shipdate) << 18) + (l_orderkey % 262144)          AS ts,
  CASE WHEN substr(md5(CAST(l_partkey * 100 + l_linenumber AS VARCHAR)), 1, 1)
            IN ('0','1','2','3')
       THEN 'delete' ELSE 'insert' END                           AS op_type,
  'default'                                                      AS db,
  'coll_' || CAST(l_suppkey % 3 AS VARCHAR)                      AS collection,
  '_default'                                                     AS partition,
  'ch_' || CAST((l_partkey * 100 + l_linenumber) % 4 AS VARCHAR) AS vchannel,
  l_partkey * 100 + l_linenumber                                 AS pk,
  CAST(1 AS BIGINT)                                              AS num_rows,
  l_orderkey                                                     AS seq
FROM lineitem
"""
