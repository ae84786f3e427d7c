"""Vector distance expressions over ``array<float>`` embedding columns.

Built-in higher-order functions (zip_with + aggregate) keep the math
JVM-side — no Python per row. Elements are cast to double before
accumulation so results are reproducible across engines (DuckDB's
list_dot_product/list_cosine_similarity also accumulate in double,
left-to-right).

At 100 TB: these are pure projections — embarrassingly parallel, no
shuffle. The expensive part of similarity search is the join strategy, not
the distance math; see analytics.similarity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_squared(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2(a: Column, b: Column) -> Column:
    return F.sqrt(l2_squared(a, b))
