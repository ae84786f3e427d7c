"""Capture .explain("formatted") snapshots for the r14 optimization round.

Usage: python scripts/dump_r14_plans.py <before|after> [name ...]

Writes plans/r14/<query>_<suffix>.txt for each named query (default: the
round's examined set below). AQE is disabled for the dump so the static
plan (exchange count, join strategy, PushedFilters, ReadSchema) is
readable — identical discipline to scripts/dump_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

#: The r14 examined set: the sealed-bench slowest tail plus the r1 anchors
#: most likely to be touched. Extra captures are cheap; only the queries
#: actually changed keep their before/after pair in git.
EXAMINED = [
    "ivf_pq_recall",
    "label_propagation_communities",
    "delete_by_expr_replay",
    "semdedup_prune",
    "pagerank_trade_graph",
    "near_dup_clusters",
    "kcore_prune_rounds",
    "setsim_prefix_join",
    "kmeans_silhouette",
    "partition_drop_replay",
    "dedup_savings_report",
    "session_consistency_read",
    "consistency_levels_read",
    "quality_canonical_selection",
    "cdc_replay_summary",
    "copurchase_lift_topk",
    "containment_quote_detection",
    "cluster_density_report",
    "triangle_parts_topk",
    "hamming_banded_join",
    "source_overlap_matrix",
    "maxsim_ann_rerank",
    "maxsim_multivector_topk",
    "banded_cosine_near_dup",
    "ivf_kmeans_build",
    "ivf_nprobe_recall_curve",
    "corpus_line_dedup",
    "lifetime_asof_apply",
    "maxscore_pruned_search",
    "fulltext_drop_ratio",
    "more_like_this",
    "bpe_merge_training",
    "near_dup_pairs",
    "hamming_topk",
    "exists_late_orders",
    "growing_sealed_read",
    "hashed_embedding_search",
    "pack_sort_order",
    "hamming_multiword_topk",
    "paragraph_near_dup",
    "streaming_watermark_finalize",
    "q1_pricing_summary",
    "minhash_bands",
    "bm25_topk",
    "cosine_topk",
]


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        raise SystemExit("usage: dump_r14_plans.py <before|after> [name ...]")
    suffix = sys.argv[1]
    names = sys.argv[2:] or EXAMINED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from milvus_cdc_spark import suite
    from milvus_cdc_spark.plans import audit
    from milvus_cdc_spark.session import get_spark

    out_dir = "/root/repo/plans/r14"
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_r14_plans")
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
