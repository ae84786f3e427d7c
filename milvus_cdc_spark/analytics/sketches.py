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

def _bucket(col: Column, seed: int, w: int) -> Column:
    """md5('<seed>:' || item) first three nibbles mod w.

    Rendered as ONE conv(hex, 16, 10) over the 3-char prefix so the md5
    subtree appears exactly once in the expression (the nibble-arithmetic
    form embedded it three times; filter predicates don't get
    subexpression elimination, so that tripled the hash work on every
    probe scan). Value-identical to nib1*256 + nib2*16 + nib3."""
    md5 = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return F.conv(F.substring(md5, 1, 3), 16, 10).cast("bigint") % w


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


def bloom_build(
    keys: DataFrame, key_col: str = "key", n_hashes: int = 3, n_words: int = 16
) -> DataFrame:
    """Build a Bloom filter over a key set as ``n_words`` 64-bit words:
    every key sets ``n_hashes`` md5-seeded bit positions; words build
    with per-word bit_or aggregation (map-side combined). Returns one
    row per non-empty word: (word_idx, bits).

    The scale use is SEMI-JOIN REDUCTION (the runtime-filter idea Spark
    applies to shuffle joins): a 63*n_words-bit summary of a dim-side
    key set broadcasts for kilobytes and prunes a 100 TB fact stream
    map-side before any join/shuffle, at a tunable false-positive rate
    (~(1 - e^{-kn/m})^k); false NEGATIVES are impossible.

    Words hold 63 usable bits (shifts 0-62): a 1 << 63 overflows a
    signed BIGINT in engines that check (DuckDB errors), so bit 63 is
    simply never used — the portability contract beats 1.6% density."""
    m = 63 * n_words
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    _bucket(F.col(key_col).cast("string"), 1000 + h, m)
                    for h in range(n_hashes)
                ]
            )
        ).alias("p")
    )
    one = F.lit(1).cast("bigint")
    return (
        pos.select(
            (F.col("p") / 63).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", one, (F.col("p") % 63).cast("int")
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_might_contain(
    probe_col, bloom_words: list[tuple[int, int]], n_hashes: int = 3,
    n_words: int = 16,
):
    """Membership predicate Column against a COLLECTED bloom (list of
    (word_idx, bits) — at most n_words ints, driver-safe at any corpus
    size): true iff every hashed bit is set. Pure column expression
    over a constant bit table, so it prunes map-side in the probe
    scan with no join at all.

    The bit table is rendered as one m-char '0'/'1' string literal
    probed with a single substring per hash — one md5 chain per hash
    in the expression tree. (A per-word chained CASE would embed the
    hash subtree in every arm; past codegen limits that evaluates
    interpreted, ~50x slower on a wide fact scan.)"""
    m = 63 * n_words
    words = {w: b for w, b in bloom_words}
    bitstr = "".join(
        "1" if (words.get(p // 63, 0) >> (p % 63)) & 1 else "0"
        for p in range(m)
    )
    lit = F.lit(bitstr)
    pred = None
    for h in range(n_hashes):
        p = _bucket(probe_col.cast("string"), 1000 + h, m)
        hit = F.substring(lit, (p + 1).cast("int"), 1) == "1"
        pred = hit if pred is None else (pred & hit)
    return pred


def _hll_rho(v: Column, bits: int = 24) -> Column:
    """Position of the highest set bit from the top of a ``bits``-wide
    integer, i.e. leading zeros + 1 (Flajolet et al.'s rho).  v == 0 maps
    to bits + 1.  A chained integer CASE — no log2, no float boundary
    risk at powers of two."""
    expr = F.lit(bits + 1)
    # build from the low end so the final expression checks v >= 2^(bits-1)
    # first: CASE WHEN v >= 2^(bits-1) THEN 1 ... WHEN v >= 1 THEN bits END
    chain = F.when(v >= 1, F.lit(bits))
    for k in range(2, bits + 1):
        chain = F.when(v >= (1 << (k - 1)), F.lit(bits + 1 - k)).otherwise(
            chain
        )
    return F.coalesce(chain, expr).cast("int")


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    m: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table (Flajolet, Fusy, Gandouet & Meunier,
    AofA 2007): every item hashes to one of ``m`` registers (md5 seed 21)
    and contributes rho(24-bit md5 seed 23) — the register keeps the MAX.

    The table is FIXED-SIZE (≤ m rows) and merges by per-register max —
    Spark's partial aggregation does the merge map-side, so a 100 TB scan
    reduces to m rows before any shuffle.  Unlike engine-native HLL
    (``approx_count_distinct``) the register layout here is md5-seeded and
    bit-identical everywhere, so registers AND estimate are
    oracle-checkable.  Returns (bucket, reg), only non-empty buckets.

    ``group_cols`` yields one register table PER GROUP — (group...,
    bucket, reg) — which is the whole point of a mergeable sketch:
    per-partition/per-day/per-source tables union by per-register max
    (max is associative), so rollups never rescan the data. See
    ``hll_merge``."""
    md5 = F.md5(F.concat(F.lit("23:"), F.col(item_col).cast("string")))
    # the 24-bit rho input as ONE conv over the 6-char md5 prefix,
    # projected to a column BEFORE the rho CASE chain — the chain
    # references v ~24 times, and inlining the md5 there put ~144 hash
    # subtrees in one expression (CollapseProject keeps the two-step
    # projection because the aliased conv is non-cheap and multiply
    # referenced)
    v24 = F.conv(F.substring(md5, 1, 6), 16, 10).cast("bigint")
    keys = list(group_cols or [])
    pre = items.select(
        *keys,
        _bucket(F.col(item_col).cast("string"), 21, m).alias("bucket"),
        v24.alias("_v"),
    )
    rows = pre.select(*keys, "bucket", _hll_rho(F.col("_v")).alias("rho"))
    return rows.groupBy(*keys, "bucket").agg(F.max("rho").alias("reg"))


def hll_merge(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union-merge grouped register tables by per-register max — the
    lossless HLL union (estimate(merge(A, B)) == estimate(A ∪ B)
    exactly, not approximately, because max commutes with the per-item
    max that built each table). ``group_cols`` keeps coarser groups;
    None folds everything into one global table."""
    keys = list(group_cols or [])
    return registers.groupBy(*keys, "bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate_frame(
    registers: DataFrame, m: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold a register table into the raw-HLL cardinality estimate.

    The harmonic-mean denominator sum(2^-reg) is kept EXACT by scaling to
    2^30 integer units: present registers add 2^(30-reg) (reg ≤ 25 for
    24-bit rho), absent registers add 2^30 each.  The only float op is
    the final alpha_m * m^2 * 2^30 / denom, a single correctly-rounded
    IEEE divide of exactly-representable values, rounded to 2dp — the
    same portability stance as ``linear_counting_distinct``.  Returns one
    row: (n_set, sum_scaled, estimate); with ``group_cols``, one row per
    group."""
    keys = list(group_cols or [])
    alpha_num = hll_alpha_numerator(m)
    agg = registers.groupBy(*keys).agg(
        F.count("*").alias("n_set"),
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                (F.lit(30) - F.col("reg")).cast("int"),
            )
        ).alias("present_sum"),
    )
    return agg.select(
        *keys,
        F.col("n_set").cast("bigint").alias("n_set"),
        (
            F.coalesce(F.col("present_sum"), F.lit(0))
            + (F.lit(m) - F.col("n_set")) * F.lit(1 << 30)
        )
        .cast("bigint")
        .alias("sum_scaled"),
    ).select(
        *keys,
        "n_set",
        "sum_scaled",
        F.round(F.lit(alpha_num) / F.col("sum_scaled"), 2).alias("estimate"),
    )


def hll_alpha_numerator(m: int) -> float:
    """alpha_m * m^2 * 2^30 as one Python float, shared verbatim by the
    Spark plan and the SQL oracle so both engines divide the SAME
    constant (alpha_m = 0.7213 / (1 + 1.079/m), the standard large-m
    bias correction)."""
    return 0.7213 / (1 + 1.079 / m) * m * m * float(1 << 30)


def linear_counting_distinct(
    items: DataFrame, item_col: str = "item", n_bits: int = 1024
) -> DataFrame:
    """Linear-counting distinct estimator (Whang et al., TODS 1990):
    hash every item to one of ``n_bits`` bitmap positions; the distinct
    estimate is -m * ln(z/m) with z = unset bits. Unlike HyperLogLog
    (whose register layout is engine-specific) the bitmap is md5-seeded
    and bit-identical everywhere, so the ESTIMATE itself is
    oracle-checkable. Fixed size, mergeable by or-ing bitmaps — the
    same partial-aggregation story as the Count-Min table.

    One lazy plan, no driver actions. Returns a 1-row frame
    (n_set, estimate rounded to 2dp); estimate is NULL in the
    degenerate all-bits-set case.
    """
    pos = items.select(
        _bucket(F.col(item_col).cast("string"), 7, n_bits).alias("p")
    )
    agg = pos.agg(F.countDistinct("p").alias("n_set"))
    return agg.select(
        F.col("n_set").cast("bigint").alias("n_set"),
        F.when(
            F.col("n_set") < n_bits,
            F.round(
                -n_bits * F.log((n_bits - F.col("n_set")) / F.lit(n_bits)), 2
            ),
        ).alias("estimate"),
    )
