"""Catalog: table loading + metadata registry.

Replaces the reference's etcd-backed metadata plane
(core/reader/etcd_op.go:562-628 GetAllCollection snapshot;
etcd_op.go:187-303 watch) with plain Spark tables: at scale each
"collection" is a parquet/Delta table; metadata lives in small dimension
tables that get broadcast-joined against streams.

For the test harness the catalog simply loads the driver-generated
TPC-H-ish parquet tables for a given scale-factor directory.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Embeddings vector width — constant 64 across every driver-generated
#: scale factor (verified against the data by
#: tests/test_driver_contract.py::test_embeddings_fixture_width, which is
#: the tripwire if a future fixture changes width). Reading it from data
#: would cost a Spark job per query invocation (a driver round-trip just
#: to learn a constant).
EMB_DIM = 64


@lru_cache(maxsize=None)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Column names stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    raw int64 (nanosAsLong) and we convert to microsecond timestamps, the
    same truncation DuckDB applies. Footer-only read, driver-side, cached."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan → Catalyst gets column pruning +
    predicate pushdown for free; callers should select/filter early so the
    pushdown reaches the scan.

    Normalizations (UTC session timezone makes these lossless):
    - TIMESTAMP(NANOS) parquet → int64 → microsecond TIMESTAMP;
    - TIMESTAMP_NTZ → TIMESTAMP so epoch functions (unix_millis, window)
      apply directly.
    """
    path = f"{sf_dir}/{name}.parquet"
    # Self-contained on ANY session (a vanilla driver harness session has
    # none of session.get_spark's confs). Both are runtime-settable:
    # nanosAsLong makes TIMESTAMP(NANOS) parquet readable (raw int64),
    # UTC pins event-time semantics regardless of host timezone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for col in _nanos_columns(path):
        # integer division: ns epoch values overflow double's exact range
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all tables as temp views so spark.sql() queries can run
    against the same names the DuckDB oracle uses."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Driver-local rows → DataFrame through the ARROW path, not the
    Python-parallelize path.

    ``spark.createDataFrame(list, schema)`` backs the frame with a
    pickled Python RDD, so EVERY downstream action pays a Python-worker
    roundtrip — measured 0.44-3.3 s per action for a 500-row frame vs
    0.20-0.28 s via a pandas/Arrow-backed local table (r13; the same
    mechanism measured 4.6 s/batch in the streaming positions A/B,
    SCALE.md §5t). Control-plane dims (drop cutoffs, union-find results,
    name mappings) are built once and joined repeatedly, so the backing
    matters. Rows are materialized into a pandas frame column-wise; the
    explicit DDL schema pins types exactly as before (including empty
    input).

    Integral and boolean columns get pandas NULLABLE dtypes derived
    from the DDL schema (ADVICE r13): a plain ``pd.DataFrame`` coerces
    a bigint column containing a NULL to float64, silently corrupting
    values above 2^53 (ns-epoch timestamps live well above it) through
    the Arrow float→int64 cast. Every other type keeps object dtype so
    Arrow converts the original Python values under the schema.
    """
    import pandas as pd

    _nullable = {
        T.ByteType: "Int8",
        T.ShortType: "Int16",
        T.IntegerType: "Int32",
        T.LongType: "Int64",
        T.BooleanType: "boolean",
    }
    fields = T.StructType.fromDDL(schema).fields
    data = [tuple(r) for r in rows]
    cols = {
        f.name: pd.Series(
            [r[i] for r in data],
            dtype=_nullable.get(type(f.dataType), object),
        )
        for i, f in enumerate(fields)
    }
    pdf = pd.DataFrame(cols, columns=[f.name for f in fields])
    return spark.createDataFrame(pdf, schema)
