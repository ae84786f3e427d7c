"""Stream-stream joins and streaming dedupe.

The reference never joins two live streams (its only joins are dimension
probes, SURVEY §2.4) — but a CDC engine rebuilt on Structured Streaming
gets watermarked stream-stream joins natively, and they are the scale
path for op-correlation queries (e.g. pairing Import begin/end ops, or
click→purchase attribution in the events fixture).

Semantics (Spark): both sides declare watermarks; the join condition
must bound event time on one side relative to the other so Spark can
expire state. State is kept per key in the checkpointed state store —
the same restart story as the reference's persisted positions.

At 100 TB: state size is bounded by (join-window × input rate), not by
history; keys shuffle-partition across executors, and RocksDB state
store backends keep per-partition state off-heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Pairs each left event with right events of the same key occurring
    within ``max_gap`` after it (inclusive on both ends).

    Works on streaming or batch frames: with streaming inputs the
    watermarks + time-range condition make the join state bounded.
    Columns are prefixed l_/r_ to keep both timestamps addressable.
    """
    l = left.select(
        F.col(key).alias("l_key"), F.col(ts_col).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, ts_col)],
    )
    r = right.select(
        F.col(key).alias("r_key"), F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, ts_col)],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond)


def streaming_dedupe(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    """First-occurrence dedupe over a stream with BOUNDED state.

    ``dropDuplicatesWithinWatermark``, not ``dropDuplicates``: with
    key-only dedup columns, plain ``dropDuplicates`` never evicts its
    state (the watermark only expires dedup state when the event-time
    column is itself among the keys) — the unbounded-state shape that
    kills a long-running ingest job. The WithinWatermark variant evicts
    each key after the watermark delay, guaranteeing exact dedup for
    duplicates arriving within that horizon; a duplicate arriving LATER
    than the watermark may re-emit — the deliberate trade that keeps
    state ∝ watermark × key rate. Duplicates beyond the horizon are the
    downstream merge sink's job (idempotent re-apply, the reference's
    own convergence rule) or the exact history-index gate
    (:func:`fingerprint_gate`).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def fingerprint_gate(
    stream: DataFrame,
    history_fps: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Ingestion-time exact-dedup gate: drop incoming documents whose
    normalized-text fingerprint already exists in the historical index —
    a stream-static LEFT ANTI join, the streaming twin of
    ``analytics.dedup.fingerprint_dedup``.

    The static side is a one-column fingerprint dim; Spark broadcasts it
    under the threshold and re-plans per micro-batch, so updates to the
    historical index are picked up between batches. Stateless — no
    watermark, no state store; duplicates WITHIN the stream are the
    watermarked ``streaming_dedupe``'s job, composing after this gate.
    At 100 TB of history the fingerprint dim outgrows a broadcast and
    the same plan degrades gracefully to a shuffled anti join keyed on
    the fingerprint.
    """
    from milvus_cdc_spark.functions.text import fingerprint

    fp = stream.withColumn("fingerprint", fingerprint(F.col(text_col)))
    return fp.join(
        F.broadcast(history_fps.select("fingerprint")), "fingerprint", "left_anti"
    )
