"""Dual-surface proof: the engine exposes BOTH the DataFrame API and a
SQL surface over the same catalog. For queries whose oracle SQL is
ANSI-portable, running that exact text through spark.sql() on the
registered views must produce the DataFrame implementation's result —
i.e., the oracle string itself is a valid query against this engine.
"""

from __future__ import annotations

import pytest

from milvus_cdc_spark import catalog, suite

#: Queries whose oracle text is dialect-portable (no DuckDB-only
#: functions like time_bucket/generate_subscripts/quantile_cont).
PORTABLE = [
    "q1_pricing_summary",
    "topk_orders",
    "conditional_priority_counts",
    "forecast_revenue_change",
    "cust_order_distribution",
    "promo_revenue_ratio",
    "returned_items_topk",
    "min_cost_supplier",
    "having_in_large_orders",
    "anti_exists_idle_customers",
    "nation_balance_share",
    "nested_semi_promo_suppliers",
    "bi_nation_volume",
    "market_share",
    "disjunctive_filter_revenue",
    "scalar_subquery_small_qty",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark(spark, sf_dir, name):
    catalog.register_views(spark, sf_dir)
    spec = suite.QUERIES[name]
    via_sql = spark.sql(spec.oracle)
    via_df = spec.fn(spark, sf_dir)
    assert _canon(via_sql) == _canon(via_df)
