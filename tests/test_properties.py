"""Property-based spot checks (SURVEY.md §5): hypothesis-driven invariants
for the fiddly operators — surrogate keys (OP33) and diagonal union (OP31).
Few examples per property (each example runs Spark jobs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from world_cup_duckdb_spark.plans.worldcup import surrogate_key

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_names = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4),
    min_size=1,
    max_size=12,
)


@given(names=_names)
@_slow
def test_surrogate_keys_dense_unique_order_invariant(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string").distinct()
    keyed = surrogate_key(df, "X-", ["name"])
    rows = {r["name"]: r["id"] for r in keyed.collect()}
    n = len(set(names))
    # dense 1-based ids, one per distinct value
    assert sorted(int(v.removeprefix("X-")) for v in rows.values()) == list(
        range(1, n + 1)
    )
    # permutation invariance: reversed input produces the same mapping
    rev = spark.createDataFrame(
        [(x,) for x in reversed(names)], "name string"
    ).distinct()
    rows_rev = {
        r["name"]: r["id"] for r in surrogate_key(rev, "X-", ["name"]).collect()
    }
    assert rows == rows_rev


@given(
    left=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=6
    ),
    right=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=6
    ),
)
@_slow
def test_diagonal_union_schema_and_null_fill(spark, left, right):
    df1 = spark.createDataFrame(left, "a int, b int")
    df2 = spark.createDataFrame(right, "b int, c int")
    out = df1.unionByName(df2, allowMissingColumns=True)
    # column set = union of inputs, in first-seen order
    assert out.columns == ["a", "b", "c"]
    rows = out.collect()
    assert len(rows) == len(left) + len(right)
    # missing columns are null exactly for the frame that lacked them
    assert out.filter(F.col("c").isNull()).count() == len(left)
    assert out.filter(F.col("a").isNull()).count() == len(right)
    # b survives from both sides intact
    got_b = sorted(r["b"] for r in rows)
    want_b = sorted([t[1] for t in left] + [t[0] for t in right])
    assert got_b == want_b
