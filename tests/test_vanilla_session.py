"""Vanilla-session contract: the driver harness builds a SparkSession with
NONE of session.get_spark's confs. Everything the suite needs must therefore
be self-contained at the point of use (catalog.load_table sets the
runtime-settable confs itself).

Round-1 regressions this guards: (1) events.parquet is TIMESTAMP(NANOS) at
every SF; without spark.sql.legacy.parquet.nanosAsLong=true a vanilla
session throws PARQUET_TYPE_ILLEGAL on read — killed 8 graded queries.
(2) The driver compares results THROUGH PANDAS, where DuckDB integer sums
(HUGEINT → float64 → "15153.0") drift from Spark longs ("15153") — killed
7 more. (3) array-typed output columns crash the driver's canonicalizer.

A vanilla session cannot be built inside the shared pytest JVM (getOrCreate
reuses the configured context), so the whole check runs in a subprocess.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import duckdb
from pyspark.sql import SparkSession
from verify_local import compare_frames

SF_DIR = "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[2]")
    .appName("vanilla_contract")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# Prove this really is a vanilla session (conf absent → default false)
assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"

from milvus_cdc_spark import suite
from milvus_cdc_spark.catalog import TABLES, load_table

# (1) TIMESTAMP(NANOS) readable via load_table on a vanilla session
ev = load_table(spark, SF_DIR, "events")
assert dict(ev.dtypes)["ts"] == "timestamp", ev.dtypes
assert ev.count() > 0

# (2)+(3) round-1 casualties, compared through pandas (the driver's path)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
for name in (
    "tumbling_window",          # bug 1: nanos read
    "cdc_replay_summary",       # bug 2: integer-sum dtype drift
    "metrics_counters",         # bug 2
    "ready_set_equality",       # bug 3: array columns
):
    spec = suite.QUERIES[name]
    spdf = spec.fn(spark, SF_DIR).toPandas()
    opdf = con.execute(spec.oracle).df()
    problems = compare_frames(spdf, opdf)
    assert not problems, (name, problems)

print("VANILLA_CONTRACT_OK")
spark.stop()
"""


def test_vanilla_session_contract():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "VANILLA_CONTRACT_OK" in out.stdout
