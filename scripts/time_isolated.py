"""Ad-hoc fresh-JVM timer for a named query list.

Usage: python scripts/time_isolated.py [sf_dir] name [name ...]

Reuses bench.run_queries (per-query sf0.001 warm-up + cache clear) so the
numbers are directly comparable to the isolated segments in BENCH_DETAIL.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from milvus_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        print("usage: time_isolated.py [sf_dir] name [name ...]", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("time-isolated")
    timings = bench.run_queries(spark, args, sf_dir)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
