"""Within-JVM interleaved A/B for env-toggled code paths.

Usage: python scripts/ab_inproc.py <toggle_env> <val_a> <val_b> \
       <name>[,name...] [pairs] [sf_dir]

Runs each query as alternating A/B pairs inside ONE session (order
A B B A A B ...), timing fn+count with the bench's warm-up/cache-clear
discipline. Because both arms share the JVM, codegen cache, and the
VM's minute-scale weather, the pairwise deltas are far tighter than
fresh-JVM draws. Only valid for toggles read at query-construction time
(e.g. SPARK_GRAFT_WIDEN_SCAN), not static Spark confs.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from milvus_cdc_spark import suite  # noqa: E402
from milvus_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    toggle, val_a, val_b, names_arg = sys.argv[1:5]
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    sf_dir = sys.argv[6] if len(sys.argv) > 6 else "/root/testdata/sf0.1"
    names = names_arg.split(",")

    spark = get_spark("ab_inproc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(name: str) -> float:
        spec = suite.QUERIES[name]
        t0 = time.time()
        spec.fn(spark, sf_dir).count()
        t = time.time() - t0
        spark.catalog.clearCache()
        return t

    for name in names:
        # warm both arms (codegen for both plan shapes)
        for v in (val_a, val_b):
            os.environ[toggle] = v
            try:
                suite.QUERIES[name].fn(spark, "/root/testdata/sf0.001").count()
            except Exception as e:
                print(f"{name} warm-up failed: {e!r}", file=sys.stderr)
            spark.catalog.clearCache()
        ta, tb = [], []
        for p in range(pairs):
            order = [("a", val_a), ("b", val_b)]
            if p % 2 == 1:
                order.reverse()
            for arm, v in order:
                os.environ[toggle] = v
                t = run(name)
                (ta if arm == "a" else tb).append(t)
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"{name}: A={ma:.3f} B={mb:.3f} ratio={mb / ma:.3f}  "
            f"a={['%.2f' % t for t in ta]} b={['%.2f' % t for t in tb]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
