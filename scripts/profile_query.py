"""Per-query phase profiler for the r14 optimization round.

Usage: python scripts/profile_query.py <name> [name ...]
       SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).

For each query, after a sf0.001 warm-up (same discipline as bench.py),
reports:
  t_fn      seconds spent in spec.fn() — plan construction plus any
            eager driver-side jobs (kmeans iterations, localCheckpoints)
  t_count   seconds in the timed .count() action
  jobs/stages/tasks executed during each phase (statusTracker deltas)

This splits a slow query into "driver-loop/build cost" vs "final action
cost", which bench.py's single t0..t1 window cannot see.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from milvus_cdc_spark import suite  # noqa: E402
from milvus_cdc_spark.session import get_spark  # noqa: E402


def _counts(tracker):
    jobs = tracker.getJobIdsForGroup(None)
    return len(jobs)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: profile_query.py <name> [name ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"

    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext

    for name in names:
        spec = suite.QUERIES.get(name)
        if spec is None:
            print(f"{name}: unregistered", file=sys.stderr)
            continue
        # warm-up: compile the stages (codegen cache) exactly like bench.py
        try:
            spec.fn(spark, warm_dir).count()
        except Exception as e:
            print(f"{name}: warm-up failed: {e!r}", file=sys.stderr)
        spark.catalog.clearCache()

        tracker = sc.statusTracker()
        j0 = tracker.getJobIdsForGroup(None) or []
        sc.setJobDescription(f"profile:{name}:fn")
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        t_fn = time.time() - t0
        j1 = tracker.getJobIdsForGroup(None) or []
        sc.setJobDescription(f"profile:{name}:count")
        t1 = time.time()
        n = df.count()
        t_count = time.time() - t1
        j2 = tracker.getJobIdsForGroup(None) or []
        sc.setJobDescription(None)
        spark.catalog.clearCache()
        print(
            f"{name}: t_fn={t_fn:.3f}s (jobs {len(j1) - len(j0)}) "
            f"t_count={t_count:.3f}s (jobs {len(j2) - len(j1)}) "
            f"total={t_fn + t_count:.3f}s rows={n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
