"""Physical-plan audit helpers.

The scale contract for every operator (SURVEY §4): filters and projections
must reach the parquet scan (PushedFilters / ReadSchema), dimension joins
must broadcast, and hot expressions must stay inside whole-stage codegen.
These helpers make that checkable in tests instead of by eyeball.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in p for p in pushed_filters(formatted_plan(df)))


def read_schema_columns(plan: str) -> list[str]:
    """Column lists actually read from parquet (pruning check)."""
    cols = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            cols.append([f.split(":")[0] for f in inner.split(",") if f])
    return cols


def count_broadcast_joins(plan: str) -> int:
    return plan.count("BroadcastHashJoin")


def count_exchanges(plan: str) -> int:
    """Shuffle count — every Exchange is a full network/disk round at scale."""
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "Broadcast" not in line and "Reused" not in line
    )


def codegen_span_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (the `*(n)` markers in the simple
    plan). More operators inside fewer spans = better pipelining."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    ids = set()
    for token in buf.getvalue().split():
        if token.startswith("*("):
            ids.add(token[2 : token.index(")")])
    return len(ids)
