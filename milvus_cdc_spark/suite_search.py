"""Search-surface parity queries: the request shapes a Milvus client runs
against replicated collections (search + boolean filter expression, range
search with radius, grouping search, offset pagination, and the SQ8
quantized-storage path) — re-expressed as declarative DataFrame plans over
the ``embeddings`` fixture and oracle-checked in DuckDB.

Scale notes: every variant is the broadcast-query brute-force scored frame
(exact path; the bucketed ANN variants in ``analytics/similarity.py``
compose the same refinements sub-quadratically) plus one Catalyst-friendly
refinement — a pushed-down scalar filter, a sim-threshold filter, stacked
window ranks bounded by (query × group) cardinality, or a rank-range page.
No arrays are collected; the only cross join broadcasts the catalog-sized
query side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark.suite import _SQL_COSINE, _t, q

# ---------------------------------------------------------------------------
# Hybrid attribute + vector search: Milvus search(filter="label % 2 == 0").
# The predicate applies before any distance math — at 100 TB the label
# filter pushes into the parquet scan and prunes the candidate set first
# (asserted in tests/test_plans.py).
# ---------------------------------------------------------------------------


@q(
    "filtered_ann_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_SQL_COSINE} AS sim
      FROM embeddings c, q
      WHERE c.vec_id != q.vec_id AND c.label % 2 = 0
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, sim
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    "vector",
    "search",
    "hybrid-filter",
    "llm",
)
def filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.analytics import similarity

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.filtered_topk(
        emb, queries, F.col("label") % 2 == 0, k=3
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Range search: all neighbors with sim >= radius (milvus.io range-search
# semantics; unbounded k — result size scales with matches).
# ---------------------------------------------------------------------------


@q(
    "range_search_radius",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_SQL_COSINE} AS sim
      FROM embeddings c, q
      WHERE c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, sim
    FROM scored WHERE sim >= 0.3
    ORDER BY query_id, sim DESC, neighbor_id
    """,
    "vector",
    "search",
    "range-search",
    "llm",
)
def range_search_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.analytics import similarity

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.range_search(emb, queries, radius=0.3).orderBy(
        "query_id", F.col("sim").desc(), "neighbor_id"
    )


# ---------------------------------------------------------------------------
# Grouping search: best hit per label, top-3 labels per query (Milvus
# group_by_field — "diverse results" semantics).
# ---------------------------------------------------------------------------


@q(
    "grouping_search_labels",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS grp,
             {_SQL_COSINE} AS sim
      FROM embeddings c, q
      WHERE c.vec_id != q.vec_id
    ),
    best AS (
      SELECT * FROM (
        SELECT query_id, grp, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id, grp
                                  ORDER BY sim DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT query_id, grp_rank, grp, neighbor_id, sim
    FROM (
      SELECT query_id, grp, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, grp) AS grp_rank
      FROM best
    ) WHERE grp_rank <= 3
    ORDER BY query_id, grp_rank
    """,
    "vector",
    "search",
    "grouping",
    "llm",
)
def grouping_search_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.analytics import similarity

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.grouping_topk(emb, queries, group_col="label", k_groups=3).orderBy(
        "query_id", "grp_rank"
    )


# ---------------------------------------------------------------------------
# Pagination: offset 3, limit 3 — "page 2" of the exact ordering (Milvus
# search offset param / query iterator).
# ---------------------------------------------------------------------------


@q(
    "search_pagination",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_SQL_COSINE} AS sim
      FROM embeddings c, q
      WHERE c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, sim
    FROM ranked WHERE rank > 3 AND rank <= 6
    ORDER BY query_id, rank
    """,
    "vector",
    "search",
    "pagination",
    "llm",
)
def search_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.analytics import similarity

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.paged_topk(emb, queries, offset=3, limit=3).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# SQ8 storage codec (Milvus IVF_SQ8): corpus vectors quantized to 8-bit
# codes (4× smaller), searched after dequantization; the query reports
# per-query recall@3 of the quantized search against full precision. The
# quantizer is pure affine integer arithmetic — floor((x-mn)/rng*255+0.5) —
# so both engines produce identical codes and identical rankings.
# ---------------------------------------------------------------------------

_SQL_SQ8_DEQ = """
  list_transform(
    c.codes, cd -> c.mn + cd / 255.0 * c.rng)
"""


@q(
    "sq8_quantized_recall",
    f"""
    WITH deq AS (
      SELECT vec_id,
             mn, rng,
             list_transform(codes, cd -> mn + cd / 255.0 * rng) AS embedding
      FROM (
        SELECT vec_id,
               list_min(embedding::DOUBLE[]) AS mn,
               greatest(list_max(embedding::DOUBLE[])
                        - list_min(embedding::DOUBLE[]), 1e-12) AS rng,
               list_transform(embedding::DOUBLE[],
                 x -> floor((x - list_min(embedding::DOUBLE[]))
                            / greatest(list_max(embedding::DOUBLE[])
                                       - list_min(embedding::DOUBLE[]), 1e-12)
                            * 255.0 + 0.5)) AS codes
        FROM embeddings
      )
    ),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    approx AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round(
                   list_sum(list_transform(list_zip(c.embedding, q.embedding::DOUBLE[]),
                                           p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(c.embedding, x -> x * x)))
                      * sqrt(list_sum(list_transform(q.embedding::DOUBLE[], x -> x * x)))),
                   6) DESC, c.vec_id) AS rank
        FROM deq c, q WHERE c.vec_id != q.vec_id
      ) WHERE rank <= 3
    ),
    exact AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 {_SQL_COSINE} DESC, c.vec_id) AS rank
        FROM embeddings c, q WHERE c.vec_id != q.vec_id
      ) WHERE rank <= 3
    )
    SELECT e.query_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           round(count(a.neighbor_id) / 3.0, 6) AS recall
    FROM exact e LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """,
    "vector",
    "quantization",
    "sq8",
    "recall",
    "llm",
)
def sq8_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from milvus_cdc_spark.analytics import similarity
    from milvus_cdc_spark.functions import vector as vecf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    deq = emb.select(
        "vec_id",
        vecf.sq8_dequantize(
            vecf.sq8_quantize(F.col("embedding"))
        ).alias("embedding"),
    )
    approx = similarity.brute_force_topk(deq, queries, k=3)
    exact = similarity.brute_force_topk(emb, queries, k=3)
    hits = exact.alias("e").join(
        approx.alias("a"),
        (F.col("e.query_id") == F.col("a.query_id"))
        & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
        "left",
    )
    return (
        hits.groupBy(F.col("e.query_id").alias("query_id"))
        .agg(
            F.count(F.col("a.neighbor_id")).alias("n_hits"),
            F.round(F.count(F.col("a.neighbor_id")) / 3.0, 6).alias("recall"),
        )
        .orderBy("query_id")
    )
