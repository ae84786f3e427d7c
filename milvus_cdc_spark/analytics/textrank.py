"""BM25 full-text relevance scoring over a document corpus.

Parity note: Milvus collection schemas can attach a BM25 ``FunctionSchema``
(reference hydrates it at core/reader/etcd_op.go:666-691 but only *copies*
the declaration — scoring happens inside Milvus). Here the scoring itself
is implemented, Spark-first: explode → filtered term stats → broadcast
joins, no UDFs.

Scale shape (100 TB corpus): the only per-corpus shuffles are the doc-length
aggregate and the (doc, term) term-frequency aggregate — both keyed on
doc_id with map-side partial counts. Per-term document frequencies and the
corpus aggregate are rows ∝ |query terms| and 1 respectively → broadcast.
Scoring is then a map-only pass. Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.functions import text as textf

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)          (Lucene/ATIRE form)
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Documents containing no query term are absent from the result (their
    score is 0 by definition).
    """
    toks = docs.select(
        F.col(id_col), F.explode(textf.tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("bm25"))
    )
