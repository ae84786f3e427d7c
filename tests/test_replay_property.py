"""Property-based test: the replay aggregate equals a straightforward
sequential interpreter of the op-log, for arbitrary op sequences.

This pins down the semantics the whole CDC path rests on (A7/J8,
delete-before-insert ties) against an independent implementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from milvus_cdc_spark.operators import apply as apply_op

ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # ts
        st.sampled_from(["insert", "delete"]),
        st.integers(min_value=0, max_value=5),  # pk
    ),
    min_size=0,
    max_size=30,
)


def python_replay(ops: list[tuple[int, str, int]]) -> set[int]:
    """Independent oracle: last-writer-wins by ts, insert wins ties."""
    last_ins: dict[int, int] = {}
    last_del: dict[int, int] = {}
    for ts, op, pk in ops:
        d = last_ins if op == "insert" else last_del
        d[pk] = max(d.get(pk, -1), ts)
    return {
        pk
        for pk, its in last_ins.items()
        if pk not in last_del or its >= last_del[pk]
    }


@given(ops_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_replay_matches_python_interpreter(spark, ops):
    rows = [(ts, op, "c", pk, 1) for ts, op, pk in ops]
    df = spark.createDataFrame(
        rows, "ts bigint, op_type string, collection string, pk bigint, num_rows bigint"
    ) if rows else spark.createDataFrame(
        [], "ts bigint, op_type string, collection string, pk bigint, num_rows bigint"
    )
    got = {r.pk for r in apply_op.replay_alive(df).collect()}
    assert got == python_replay(ops)
