"""Mergeable frequency sketches.

Count-Min (Cormode & Muthukrishnan, J.Alg 2005): a d x w counter matrix;
every item increments one bucket per hash row, and a point estimate is
the MIN over its d buckets — always an OVERestimate, with error
<= corpus_size * e/w at confidence 1 - e^-d.

Why it matters at 100 TB: the sketch is FIXED-SIZE (d*w cells) no
matter the corpus, and it merges by cell-wise addition — exactly what
Spark's partial aggregation does for free when the sketch is built with
a (row, bucket) groupBy. Estimating heavy hitters then costs a
broadcast of the d*w-cell table instead of a corpus-wide groupBy on the
full key space.

Hashes are seeded md5 (the repo's portable-hash contract): every cell,
and therefore every estimate, is bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _bucket(col: Column, seed: int, w: int) -> Column:
    """md5('<seed>:' || item) first three nibbles mod w."""
    md5 = F.md5(F.concat(F.lit(f"{seed}:"), col))

    def nib(i: int) -> Column:
        return (F.instr(F.lit(HEX), F.substring(md5, i, 1)) - 1).cast("bigint")

    return (nib(1) * 256 + nib(2) * 16 + nib(3)) % w


def cms_build(
    items: DataFrame, item_col: str = "item", d: int = 4, w: int = 256
) -> DataFrame:
    """Build the d x w Count-Min table from an item stream: one explode
    of each row into its d (row, bucket) cells, one map-side-combined
    aggregate. Returns (row, bucket, cnt) — d*w rows max."""
    cells = items.select(
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), r, w) for r in range(d)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str = "item",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-estimate candidate frequencies against a built sketch: each
    candidate joins its d cells (broadcast — the sketch is d*w rows at
    any corpus size) and takes the min. Returns (item, est)."""
    probes = candidates.select(
        F.col(item_col),
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), r, w) for r in range(d)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
