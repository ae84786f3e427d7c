"""Capture .explain("formatted") snapshots for the r15 optimization round.

Usage: python scripts/dump_r15_plans.py <before|after> [name ...]

Writes plans/r15/<query>_<suffix>.txt for each named query (default: the
round's examined set below). AQE is disabled for the dump so the static
plan (exchange count, join strategy, PushedFilters, ReadSchema) is
readable — identical discipline to scripts/dump_r14_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

#: The r15 examined set: the verdict's named targets plus every query a
#: change this round could touch. Extra captures are cheap; only the
#: queries actually changed keep their before/after pair in git.
EXAMINED = [
    "ivf_pq_recall",
    "ivf_nprobe_recall_curve",
    "latest_version_dedupe",
    "ann_bucketed_topk",
    "semdedup_prune",
    "pq_adc_recall",
    "more_like_this",
    "hybrid_dense_fulltext_rrf",
    "pq_codebooks",
    "kmeans_silhouette",
    "ivf_kmeans_build",
    "ivf_topk",
    "ignore_growing_read",
    "dispatcher_routing",
    "filtered_oplog_counts",
]


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        raise SystemExit("usage: dump_r15_plans.py <before|after> [name ...]")
    suffix = sys.argv[1]
    names = sys.argv[2:] or EXAMINED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from milvus_cdc_spark import suite
    from milvus_cdc_spark.plans import audit
    from milvus_cdc_spark.session import get_spark

    out_dir = "/root/repo/plans/r15"
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_r15_plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    for name in names:
        spec = suite.QUERIES.get(name)
        if spec is None:
            print(f"skip (unregistered): {name}", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = audit.formatted_plan(df)
        except Exception as e:
            print(f"plan failed for {name}: {e!r}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"{name}: exchanges={audit.count_exchanges(plan)} "
            f"broadcast_joins={audit.count_broadcast_joins(plan)} -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
