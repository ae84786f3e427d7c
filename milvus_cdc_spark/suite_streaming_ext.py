"""Streaming-extension queries: stream-stream join, streaming dedupe,
and the applyInPandasWithState channel tracker — each executed as a real
Structured Streaming query (file source, availableNow) whose converged
result is oracle-checkable because the final state is order-independent.
"""

from __future__ import annotations

import tempfile
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark import catalog, oplog
from milvus_cdc_spark.catalog import local_frame as _local_frame
from milvus_cdc_spark.suite import q


#: Process-lifetime fixture cache, same contract as
#: ``suite._OPLOG_STAGE_CACHE``: the normalized-events staging is
#: deterministic per source table, queries never mutate the staged dir,
#: and one session (bench suite body / verify sweep) stages once.
_EVENT_STAGE_CACHE: dict[tuple[str, int], str] = {}

#: Per-process memos for the other deterministic stream stagings (r14
#: optimization: each re-derived + re-wrote its fixture on every call).
_GATE_STAGE_CACHE: dict[str, str] = {}
_TWO_FILE_STAGE_CACHE: dict[str, str] = {}


def _stage_events(spark: SparkSession, sf_dir: str, n_files: int = 4) -> tuple[str, DataFrame]:
    """Write normalized events to a temp dir for the file-stream source
    (memoized per (sf_dir, n_files) for the life of the process)."""
    import os

    ev = catalog.load_table(spark, sf_dir, "events")
    key = (os.path.abspath(sf_dir), n_files)
    cached = _EVENT_STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached, ev
    stage = tempfile.mkdtemp(prefix="events_sstream_") + "/files"
    ev.repartition(n_files).write.mode("overwrite").parquet(stage)
    _EVENT_STAGE_CACHE[key] = stage
    return stage, ev


def _run_to_memory(
    df: DataFrame,
    mode: str,
    state_partitions: int | None = None,
    no_data_batches: bool = True,
) -> DataFrame:
    """Drain a streaming frame into a memory sink and return the table.

    ``state_partitions`` right-sizes the stateful-operator partition
    count for THIS query: a streaming query pins
    ``spark.sql.shuffle.partitions`` into its checkpoint at first batch,
    and every stateful operator then commits one state store per
    partition per microbatch — for a stream-stream join that is 4 stores
    x partitions x batches of checkpoint I/O regardless of data volume.
    Inheriting the batch-tuned 32 gives a per-trigger file's worth of
    rows 128 store commits per batch (the r13 profile's dominant cost);
    production sizes this to stream throughput, so the suite queries
    pass an explicit, documented value instead of the batch default.
    The conf is restored after the drain — suite queries run
    sequentially, and batch queries plan their own shuffle count at
    execution time anyway."""
    import os as _os

    spark = df.sparkSession
    sink = f"mem_{_uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # measurement override (A/B harness only): forces every caller's
    # state-partition count without touching the documented per-query
    # values below
    env_parts = _os.environ.get("SPARK_GRAFT_STATE_PARTS")
    if env_parts:
        state_partitions = int(env_parts)
    # ``no_data_batches=False`` skips the trailing empty microbatch Spark
    # schedules to advance the watermark and evict state. ONLY valid for
    # queries whose OUTPUT does not depend on watermark finalization —
    # inner stream-stream joins and within-watermark dedupe emit rows as
    # they arrive; append-mode aggregations (watermark_finalize) REQUIRE
    # the no-data batch to emit their final windows, so they keep the
    # default. State eviction is irrelevant for an availableNow drain
    # into a memory sink (the state dies with the query).
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    # Measurement override, OPT-OUT CALLERS ONLY (ADVICE r14): an
    # append-mode aggregation's final windows are emitted BY the
    # trailing no-data batch, so force-disabling it for every caller
    # would silently produce wrong results for those queries — unlike
    # the perf-only knobs. The env var therefore only reaches callers
    # that already declared themselves emission-independent by passing
    # no_data_batches=False (it can flip THEM back on for an A/B).
    env_ndb = _os.environ.get("SPARK_GRAFT_NO_DATA_BATCHES")
    if env_ndb is not None and not no_data_batches:
        no_data_batches = env_ndb != "0"
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if not no_data_batches:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        query = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if not no_data_batches:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
            )
    return spark.table(sink)


# ---------------------------------------------------------------------------
# Stream-stream join: click → purchase attribution within 1 hour per user.
# Both sides are the same live stream; watermark + time-range condition
# bound the join state. The converged pair set is exactly the batch
# interval join, so DuckDB can oracle it.
# ---------------------------------------------------------------------------


@q(
    "streaming_stream_join",
    """
    SELECT CAST(date_trunc('day', a.ts) AS DATE) AS click_day,
           count(*) AS n_attributed,
           round(sum(b.value), 2) AS attributed_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY 1
    ORDER BY 1
    """,
    "streaming",
    "stream-stream-join",
    "watermark",
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.streaming.joins import interval_attribution_join

    stage, ev = _stage_events(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    clicks = stream.filter(F.col("event_type") == "click").select("user_id", "ts")
    buys = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    pairs = interval_attribution_join(
        clicks, buys, key="user_id", max_gap="1 hour", watermark="31 days"
    )
    # 2 state partitions for a one-file-per-trigger stream (see
    # _run_to_memory): a stream-stream join commits 4 state stores per
    # partition per batch, so the store count — not join compute — is
    # the measured cost at this input rate. r13 interleaved A/B: 32
    # partitions 12.3-15.8 s vs 8 at 5.1-5.6 s; r14: 8 -> 4 ratio
    # 0.658, 4 -> 2 ratio 0.711/0.766 across two independent A/Bs,
    # identical output. Production sizes this to stream throughput.
    # no_data_batches=False: an inner join emits matches as they arrive;
    # the trailing empty batch only evicts state this drain discards
    # anyway (r14 A/B: ratio 0.736; streaming_dedupe measured 1.296 on
    # the same toggle and keeps the default)
    out = _run_to_memory(pairs, "append", state_partitions=2, no_data_batches=False)
    return (
        out.groupBy(F.to_date(F.date_trunc("day", "l_ts")).alias("click_day"))
        .agg(
            F.count("*").alias("n_attributed"),
            F.round(F.sum("r_value"), 2).alias("attributed_value"),
        )
        .orderBy("click_day")
    )


# ---------------------------------------------------------------------------
# Streaming dedupe: first occurrence of each (user_id, event_type) pair.
# The surviving key set is order-independent → equals batch DISTINCT.
# ---------------------------------------------------------------------------


@q(
    "streaming_dedupe",
    """
    SELECT event_type, count(*) AS n_unique_users
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
    "streaming",
    "dedupe",
    "watermark",
)
def streaming_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.streaming.joins import streaming_dedupe as dedupe

    stage, ev = _stage_events(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    uniq = dedupe(stream, ["user_id", "event_type"], watermark="31 days")
    # r14 A/B 8 -> 4: ratio 0.867 (store-commit bound, same as the join)
    out = _run_to_memory(
        uniq.select("user_id", "event_type"), "append", state_partitions=4
    )
    return (
        out.groupBy("event_type")
        .agg(F.count("*").alias("n_unique_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# applyInPandasWithState channel tracker: running per-vchannel high-water
# mark. Update mode emits the running state each trigger; the row with the
# final pack count per channel is the converged state — max_ts/n_packs are
# order-independent (oracle-checkable); n_regressions is arrival-order
# dependent so it is excluded from the checked output.
# ---------------------------------------------------------------------------


@q(
    "streaming_state_tracker",
    f"""
    WITH ops AS ({oplog.ORACLE_OPLOG_SQL})
    SELECT vchannel, max(ts) AS max_ts, count(*) AS n_packs
    FROM ops
    GROUP BY vchannel
    ORDER BY vchannel
    """,
    "streaming",
    "stateful",
    "applyInPandasWithState",
)
def streaming_state_tracker(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.streaming.pipeline import OPLOG_SCHEMA
    from milvus_cdc_spark.streaming.state import channel_ts_tracker

    # same staged layout as before (derive_oplog → 6 files), now through
    # the shared per-process memo instead of a fresh derive+write per call
    from milvus_cdc_spark.suite import _write_oplog_files

    src = _write_oplog_files(spark, sf_dir, n_files=6)
    stream = (
        spark.readStream.schema(OPLOG_SCHEMA).option("maxFilesPerTrigger", 2).parquet(src)
    )
    tracked = channel_ts_tracker(stream)
    # r14 A/B 8 -> 4: ratio 0.953 (4 vchannels — 4 groups is the
    # operator's full parallelism; fewer stores, same group spread)
    out = _run_to_memory(tracked, "update", state_partitions=4)
    # the tracker's max_ts and n_packs are monotonic across emissions, so
    # the converged state per channel is simply the per-key max
    return (
        out.groupBy("vchannel")
        .agg(F.max("max_ts").alias("max_ts"), F.max("n_packs").alias("n_packs"))
        .orderBy("vchannel")
    )


# ---------------------------------------------------------------------------
# Multimodal frame sampling: payload → every-3rd 64-byte frame, one row
# per frame (mapInPandas row-exploding shape). English-only docs keep the
# byte/char slicing identical across engines.
# ---------------------------------------------------------------------------


@q(
    "frame_sample",
    """
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0 AND lang = 'en'
    ),
    idx AS (
      SELECT doc_id, text,
             unnest(generate_series(0, (length(text) - 1) // 64)) AS frame_no
      FROM docs
    )
    SELECT doc_id, frame_no,
           length(substr(text, frame_no * 64 + 1, 64)) AS n_bytes,
           md5(substr(text, frame_no * 64 + 1, 64)) AS frame_hash
    FROM idx
    WHERE frame_no % 3 = 0
    ORDER BY doc_id, frame_no
    """,
    "multimodal",
    "pandas-udf",
    "llm",
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.analytics import multimodal

    docs = catalog.load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 10 == 0) & (F.col("lang") == "en")
    )
    media = multimodal.as_media_table(docs)
    return multimodal.sample_frames(media, frame_bytes=64, every_n=3).orderBy(
        "doc_id", "frame_no"
    )


# ---------------------------------------------------------------------------
# Streaming session windows: the same 30-min-gap sessionization as the
# batch session_window_agg, executed as a watermarked stream (complete
# mode). Session merging across microbatches is the stateful part Spark
# handles in the session-window state store.
# ---------------------------------------------------------------------------


@q(
    "streaming_session_window",
    """
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - coalesce(lag(ts) OVER w, ts) > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           count(*)                        AS n_events,
           round(sum(value), 2)            AS total_value
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    "streaming",
    "session",
    "watermark",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage, ev = _stage_events(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "31 days")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    # r14 A/B 8 -> 4: ratio 0.899 (and 4 -> 2 REGRESSED 1.123 — the
    # complete-mode session store rewrite wants the parallelism)
    out = _run_to_memory(agg, "complete", state_partitions=4)
    return (
        out.select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# T1 time-tick heartbeat, as a deterministic event-time replay: the
# reference emits a TT message per channel whenever data arrives OR the
# 500 ms TTInterval elapses on an idle channel (UnsafeShouldSendTSMsg,
# ts_manager.go:324-336; interval core/model/reader.go:63). Replayed over
# the op-log's hybrid-TSO physical clock (ts >> 18 = epoch-ms), the
# heartbeat schedule per channel is a pure function of the inter-arrival
# gaps: a gap of G ms emits greatest(G-1,0) div 500 idle heartbeats.
#
# The *processing-time* operator itself (applyInPandasWithState with
# ProcessingTimeTimeout, streaming/state.timetick_fallback) is executed and
# asserted in tests/test_streaming.py — timers aren't batch-deterministic,
# so the suite entry checks the schedule arithmetic both engines can agree
# on. Scale: one window + one agg per channel, shuffle bounded by channel
# cardinality.
# ---------------------------------------------------------------------------


@q(
    "timetick_heartbeat",
    f"""
    WITH ops AS ({oplog.ORACLE_OPLOG_SQL}),
    ph AS (SELECT vchannel, ts >> 18 AS phys FROM ops),
    g AS (
      SELECT vchannel,
             phys - lag(phys) OVER (PARTITION BY vchannel ORDER BY phys) AS gap
      FROM ph
    )
    SELECT vchannel,
           count(*) AS n_msgs,
           CAST(sum(CASE WHEN gap > 500 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_idle_gaps,
           CAST(sum(greatest(coalesce(gap, 0) - 1, 0) // 500) AS BIGINT)
             AS n_heartbeats,
           CAST(max(coalesce(gap, 0)) AS BIGINT) AS max_idle_ms
    FROM g
    GROUP BY vchannel
    ORDER BY vchannel
    """,
    "cdc",
    "timetick",
    "heartbeat",
)
def timetick_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ops = oplog.derive_oplog(catalog.load_table(spark, sf_dir, "lineitem"))
    ph = ops.select("vchannel", F.shiftright("ts", 18).alias("phys"))
    w = Window.partitionBy("vchannel").orderBy("phys")
    g = ph.withColumn("gap", F.col("phys") - F.lag("phys").over(w))
    return (
        g.groupBy("vchannel")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum(F.when(F.col("gap") > 500, 1).otherwise(0)).alias("n_idle_gaps"),
            F.sum(
                F.expr("greatest(coalesce(gap, 0) - 1, 0) div 500")
            ).alias("n_heartbeats"),
            F.max(F.coalesce("gap", F.lit(0))).alias("max_idle_ms"),
        )
        .orderBy("vchannel")
    )


# ---------------------------------------------------------------------------
# P3 + RBAC routing: a deterministic mixed DDL/RBAC op stream is routed
# through the replicate gate at BOTH settings of enable_user_role
# (reference option; channel_writer.go:126-141 routes 8 credential/role/
# privilege op types + the privilege-group trio). The output is the routed
# count per (enabled, op_class): with the gate closed every RBAC op is
# 'filtered'; open, each routes to its handler class. The stateful
# describe-before-mutate apply (RbacState) is asserted in pytest — this
# entry checks the gate + routing fabric the driver can oracle.
# ---------------------------------------------------------------------------

_RBAC_OP_CASE = """
    CASE o_orderkey % 11
      WHEN 0 THEN 'create_credential'  WHEN 1 THEN 'delete_credential'
      WHEN 2 THEN 'update_credential'  WHEN 3 THEN 'create_role'
      WHEN 4 THEN 'drop_role'          WHEN 5 THEN 'operate_user_role'
      WHEN 6 THEN 'operate_privilege'  WHEN 7 THEN 'operate_privilege_v2'
      WHEN 8 THEN 'create_privilege_group'
      WHEN 9 THEN 'drop_privilege_group'
      ELSE 'operate_privilege_group' END
"""


@q(
    "rbac_routing",
    f"""
    WITH rbac_ops AS (
      SELECT CASE WHEN o_orderkey % 3 = 0
                  THEN {_RBAC_OP_CASE}
                  ELSE 'create_collection' END AS op_type
      FROM orders
    ),
    gated AS (
      SELECT op_type, enabled,
             CASE
               WHEN op_type = 'create_collection' THEN 'collection_ddl'
               WHEN NOT enabled THEN 'filtered'
               WHEN op_type LIKE '%credential%' THEN 'credential'
               WHEN op_type LIKE '%privilege_group%' THEN 'privilege_group'
               WHEN op_type LIKE '%role%' THEN 'role'
               ELSE 'privilege' END AS route
      FROM rbac_ops CROSS JOIN (VALUES (TRUE), (FALSE)) AS flags(enabled)
    )
    SELECT enabled, route, count(*) AS n_ops
    FROM gated
    GROUP BY enabled, route
    ORDER BY enabled, route
    """,
    "rbac",
    "filter",
    "routing",
    "cdc",
)
def rbac_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.operators.filters import RBAC_OP_TYPES

    orders = catalog.load_table(spark, sf_dir, "orders")
    op_type = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.element_at(
            F.array(*[F.lit(t) for t in RBAC_OP_TYPES]),
            (F.col("o_orderkey") % 11 + 1).cast("int"),
        ),
    ).otherwise(F.lit("create_collection"))
    ops = orders.select(op_type.alias("op_type"))
    flags = _local_frame(spark, [(True,), (False,)], "enabled boolean")
    route = (
        F.when(F.col("op_type") == "create_collection", F.lit("collection_ddl"))
        .when(~F.col("enabled"), F.lit("filtered"))
        .when(F.col("op_type").contains("credential"), F.lit("credential"))
        .when(F.col("op_type").contains("privilege_group"), F.lit("privilege_group"))
        .when(F.col("op_type").contains("role"), F.lit("role"))
        .otherwise(F.lit("privilege"))
    )
    return (
        ops.crossJoin(F.broadcast(flags))
        .withColumn("route", route)
        .groupBy("enabled", "route")
        .agg(F.count("*").alias("n_ops"))
        .orderBy("enabled", "route")
    )


# ---------------------------------------------------------------------------
# Full DDL op-table routing (channel_writer.go initOPMessageFuncs :117-141
# + initAPIEventFuncs :108-113): every op type the reference's writer
# dispatches, classified to its handler family. The state-machine applies
# (IndexState / LoadState / RbacState idempotence) are asserted in pytest;
# this entry oracle-checks the dispatch fabric itself.
# ---------------------------------------------------------------------------

_DDL_OP_TYPES = (
    # DML (not opMessage — the replicate data path)
    "insert", "delete",
    # API events (initAPIEventFuncs)
    "create_collection", "drop_collection", "create_partition", "drop_partition",
    # database ops
    "create_database", "drop_database", "alter_database",
    # index ops
    "create_index", "drop_index", "alter_index",
    # load/release + flush
    "load_collection", "release_collection", "load_partitions",
    "release_partitions", "flush",
    # RBAC (11 types, RBAC_OP_TYPES)
    "create_credential", "delete_credential", "update_credential",
    "create_role", "drop_role", "operate_user_role",
    "operate_privilege", "operate_privilege_v2", "create_privilege_group",
    "drop_privilege_group", "operate_privilege_group",
)

_SQL_DDL_LIST = "[" + ", ".join(f"'{t}'" for t in _DDL_OP_TYPES) + "]"


@q(
    "ddl_op_routing",
    f"""
    WITH ops AS (
      SELECT list_extract({_SQL_DDL_LIST},
                          CAST(o_orderkey % {len(_DDL_OP_TYPES)} AS INTEGER) + 1)
               AS op_type
      FROM orders
    )
    SELECT CASE
             WHEN op_type IN ('insert', 'delete') THEN 'dml'
             WHEN op_type IN ('create_collection', 'drop_collection',
                              'create_partition', 'drop_partition')
               THEN 'api_event'
             WHEN op_type IN ('create_database', 'drop_database',
                              'alter_database') THEN 'database'
             WHEN op_type IN ('create_index', 'drop_index', 'alter_index')
               THEN 'index'
             WHEN op_type IN ('load_collection', 'release_collection',
                              'load_partitions', 'release_partitions')
               THEN 'load_release'
             WHEN op_type = 'flush' THEN 'flush'
             ELSE 'rbac' END AS route,
           count(*) AS n_ops,
           count(DISTINCT op_type) AS n_op_types
    FROM ops
    GROUP BY 1
    ORDER BY 1
    """,
    "cdc",
    "ddl",
    "routing",
)
def ddl_op_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.operators.ddl import (
        DATABASE_OP_TYPES,
        INDEX_OP_TYPES,
        LOAD_OP_TYPES,
    )

    orders = catalog.load_table(spark, sf_dir, "orders")
    op_type = F.element_at(
        F.array(*[F.lit(t) for t in _DDL_OP_TYPES]),
        (F.col("o_orderkey") % len(_DDL_OP_TYPES) + 1).cast("int"),
    )
    route = (
        F.when(F.col("op_type").isin("insert", "delete"), F.lit("dml"))
        .when(
            F.col("op_type").isin(
                "create_collection", "drop_collection",
                "create_partition", "drop_partition",
            ),
            F.lit("api_event"),
        )
        .when(F.col("op_type").isin(*DATABASE_OP_TYPES), F.lit("database"))
        .when(F.col("op_type").isin(*INDEX_OP_TYPES), F.lit("index"))
        .when(F.col("op_type").isin(*LOAD_OP_TYPES), F.lit("load_release"))
        .when(F.col("op_type") == "flush", F.lit("flush"))
        .otherwise(F.lit("rbac"))
    )
    return (
        orders.select(op_type.alias("op_type"))
        .withColumn("route", route)
        .groupBy("route")
        .agg(
            F.count("*").alias("n_ops"),
            F.count_distinct("op_type").alias("n_op_types"),
        )
        .orderBy("route")
    )


# ---------------------------------------------------------------------------
# Ingestion-time dedup gate: a file stream of incoming documents anti-
# joins the static historical fingerprint index — re-crawled duplicates
# (deterministic replicas of historical docs, the same construction the
# near-dup queries use) are dropped; genuinely new docs pass. The
# converged kept-set equals the batch anti join, so DuckDB oracles it.
# ---------------------------------------------------------------------------


@q(
    "streaming_fingerprint_gate",
    """
    WITH hist AS (
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fp
      FROM documents WHERE doc_id < 200
    ),
    incoming AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id >= 200
      UNION ALL
      SELECT doc_id + 100000, source, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept
    FROM incoming
    WHERE md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          NOT IN (SELECT fp FROM hist)
    GROUP BY source
    ORDER BY source
    """,
    "streaming",
    "dedup",
    "stream-static",
    "llm",
)
def streaming_fingerprint_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static anti-join dedup gate (streaming.joins
    .fingerprint_gate): history = docs < 200; the stream carries docs
    >= 200 plus re-crawled replicas of every doc_id % 10 == 0 —
    replicas of HISTORICAL docs are dropped, replicas of new docs pass
    (within-stream dedup is streaming_dedupe's job)."""
    from milvus_cdc_spark.analytics.dedup import fingerprint_dedup
    from milvus_cdc_spark.streaming.joins import fingerprint_gate

    docs = catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    hist = fingerprint_dedup(docs.filter(F.col("doc_id") < 200)).select(
        "fingerprint"
    )
    incoming = docs.filter(F.col("doc_id") >= 200).unionAll(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
        )
    )
    # per-process staging memo (same contract as _EVENT_STAGE_CACHE):
    # the incoming-docs derivation is deterministic per sf_dir
    import os as _os

    key = _os.path.abspath(sf_dir)
    stage = _GATE_STAGE_CACHE.get(key)
    if not (stage and _os.path.isdir(stage)):
        stage = tempfile.mkdtemp(prefix="docs_gate_") + "/files"
        incoming.repartition(4).write.mode("overwrite").parquet(stage)
        _GATE_STAGE_CACHE[key] = stage
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    kept = fingerprint_gate(stream, hist)
    out = _run_to_memory(kept.select("source"), "append")
    return (
        out.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_kept"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Watermark finalization in APPEND mode: a two-file stream (explicit
# modification-time order, maxFilesPerTrigger=1) with a 1-hour
# watermark over daily tumbling windows emits EXACTLY the windows whose
# end precedes the final watermark (global max event time - 1h) — the
# newest day stays in state, withheld. Measured Spark behavior this
# repo pins (probe in tests): with availableNow the admitted late rows
# of batch 2 are NOT dropped (numRowsDroppedByWatermark == 0); the
# watermark's observable effect is emission gating, which is what this
# query oracle-checks.
# ---------------------------------------------------------------------------


def _stage_two_ordered_files(spark: SparkSession, sf_dir: str) -> tuple[str, DataFrame]:
    """Split events into two single-file batches (user_id % 3 != 0 first,
    the rest second) with explicit mtimes so the file source's batch
    order is deterministic."""
    import os
    import shutil

    ev = catalog.load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_type", "value"
    )
    key = os.path.abspath(sf_dir)
    cached = _TWO_FILE_STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached, ev
    tmp = tempfile.mkdtemp(prefix="late_events_")
    stage = tmp + "/files"
    os.makedirs(stage)
    parts = [
        ev.filter(F.col("user_id") % 3 != 0),
        ev.filter(F.col("user_id") % 3 == 0),
    ]
    for i, df in enumerate(parts):
        d = f"{tmp}/b{i}"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = [p for p in os.listdir(d) if p.startswith("part-")][0]
        dst = f"{stage}/{i:02d}.parquet"
        shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))
    _TWO_FILE_STAGE_CACHE[key] = stage
    return stage, ev


@q(
    "streaming_watermark_finalize",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE date_trunc('day', ts) + INTERVAL 1 DAY
            <= (SELECT m FROM mx) - INTERVAL 1 HOUR
    GROUP BY day
    ORDER BY day
    """,
    "streaming",
    "watermark",
    "append",
)
def streaming_watermark_finalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode daily aggregate over a deterministic two-batch file
    stream: emitted set == windows finalized by the final watermark."""
    stage, ev = _stage_two_ordered_files(spark, sf_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    # r14 A/B 8 -> 4: ratio 0.732
    out = _run_to_memory(agg, "append", state_partitions=4)
    return out.select(
        F.col("w.start").cast("date").alias("day"), "n_events", "total_value"
    ).orderBy("day")
