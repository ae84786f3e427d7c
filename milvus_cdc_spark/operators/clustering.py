"""Clustering-compaction statistics and zone-map pruning (Milvus 2.4
clustering key / PartitionStats: major compaction redistributes segments
by a clustering key and records per-segment key min/max, so a range
predicate prunes whole segments before any scan — milvus.io Clustering
Compaction; the reference replicates the clustering-key schema field
like any other, and the replica's reader benefits only if the engine
rebuilds the same pruning stats).

Spark-first: the "segments" are equal-width key ranges; the stats frame
is one map-side-combined aggregate (n_buckets rows — catalog-sized, the
PartitionStats analog); pruning verdicts are pure column predicates on
that frame. At 100 TB the same stats come free from parquet row-group
zone maps when data is WRITTEN clustered — `repartitionByRange(key)`
before the write is the compaction; this module computes the stats the
pruning decision needs when the layout is inherited rather than
rewritten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bucket_stats(
    df: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Per-range-bucket (segment analog) stats of the clustering key:
    bucket id, row count, key min/max. Bucket width derives from the
    key's max via a 1-row broadcast — ``floor(key / ceil((max+1)/n))``
    — so bucketing is deterministic and engine-portable (exact integer
    arithmetic only)."""
    key = F.col(key_col)
    mx = df.agg(F.max(key).cast("bigint").alias("_mx"))
    width = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil((F.col("_mx") + 1) / F.lit(n_buckets)).cast("bigint"),
    )
    return (
        df.crossJoin(F.broadcast(mx))
        .select(
            F.floor(key.cast("bigint") / width).cast("bigint").alias("bucket_id"),
            key.cast("bigint").alias("_k"),
        )
        .groupBy("bucket_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
    )


def prune_verdict(lo: Column | int, hi: Column | int) -> Column:
    """Zone-map pruning predicate for a ``key BETWEEN lo AND hi`` scan
    over ``range_bucket_stats`` output: a bucket survives iff its
    [min_key, max_key] intersects [lo, hi] — false means the whole
    segment is skipped without reading a row."""
    lo_c = lo if isinstance(lo, Column) else F.lit(lo)
    hi_c = hi if isinstance(hi, Column) else F.lit(hi)
    return ~((F.col("max_key") < lo_c) | (F.col("min_key") > hi_c))


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton / Z-order interleave of the low ``bits`` bits of two
    non-negative integer columns — the multi-column clustering key
    behind Delta OPTIMIZE ZORDER BY and Hudi space-filling-curve
    clustering: rows close in (x, y) land close in z, so range-bucketing
    by z gives every bucket a TIGHT zone map on BOTH dimensions at once,
    where single-key clustering helps only its own column.

    Pure integer column algebra (2·bits shift-mask-or terms unrolled
    into one whole-stage-codegen expression) — engine-portable, no UDF.
    """
    out: Column | None = None
    for i in range(bits):
        xb = F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i)
        )
        yb = F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
        term = xb + yb
        out = term if out is None else out + term
    assert out is not None
    return out.cast("bigint")


def sql_zorder_key(x: str, y: str, bits: int = 8) -> str:
    """DuckDB expression computing the identical Morton key (oracle
    twin of :func:`zorder_key`)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def layout_pruning_stats(
    df: DataFrame,
    file_col: Column,
    x_col: Column,
    y_col: Column,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    layout: str,
) -> DataFrame:
    """Zone-map pruning effectiveness of a file layout for a 2-D box
    predicate: assign each row to a "file" (``file_col``), record the
    per-file min/max of both dimensions (the parquet row-group /
    PartitionStats zone map), and count how many files — and how many
    rows inside them — a scanner must touch because the file's
    [min, max] × [min, max] rectangle overlaps the query box.

    One map-side-combined aggregate keyed by file id (file-count-sized
    output), then a scalar rollup — at 100 TB the stats frame is
    thousands of rows regardless of data volume.

    Returns one row: (layout, n_files, n_rows, files_scanned,
    rows_scanned, rows_matching).
    """
    in_box = (
        (x_col >= x_lo) & (x_col <= x_hi) & (y_col >= y_lo) & (y_col <= y_hi)
    ).cast("int")
    per_file = df.select(
        file_col.alias("file_id"),
        x_col.alias("_x"),
        y_col.alias("_y"),
        in_box.alias("_m"),
    ).groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("_x").alias("x_min"),
        F.max("_x").alias("x_max"),
        F.min("_y").alias("y_min"),
        F.max("_y").alias("y_max"),
        F.sum("_m").alias("n_match"),
    )
    overlaps = (
        (F.col("x_max") >= x_lo)
        & (F.col("x_min") <= x_hi)
        & (F.col("y_max") >= y_lo)
        & (F.col("y_min") <= y_hi)
    )
    return per_file.agg(
        F.lit(layout).alias("layout"),
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(overlaps.cast("int")).cast("bigint").alias("files_scanned"),
        F.sum(F.when(overlaps, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("n_match").cast("bigint").alias("rows_matching"),
    )
