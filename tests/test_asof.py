"""As-of join: match semantics, ties, nulls, plan shape."""

from vstream_spark.operators.asof import asof_join
from vstream_spark.plans.audit import assert_plan_lacks, count_exchanges


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d"), (3, 9, "e")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 200.0), (1, 19, 300.0), (2, 30, 400.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = {r.tag: (r.asof_ts, r.asof_v) for r in
           asof_join(left, right, on="ts", by="k", right_cols=["v"]).collect()}
    assert out["a"] == (10, 200.0)   # equal ts matches (<=)
    assert out["b"] == (19, 300.0)   # latest preceding
    assert out["c"] == (None, None)  # nothing at-or-before ts=5
    assert out["d"] == (None, None)  # right row exists but is later
    assert out["e"] == (None, None)  # key has no right rows at all


def test_asof_preserves_left_rows_and_columns(spark):
    left, right = _frames(spark)
    j = asof_join(left, right, on="ts", by="k", right_cols=["v"])
    assert j.count() == left.count()
    assert set(j.columns) == {"k", "ts", "tag", "asof_ts", "asof_v"}


def test_asof_single_exchange_no_python(spark):
    left, right = _frames(spark)
    j = asof_join(left, right, on="ts", by="k", right_cols=["v"])
    # one hash exchange on the key; union+window, all JVM-side
    assert count_exchanges(j) == 1
    assert_plan_lacks(j, "ArrowEvalPython", "BatchEvalPython", "CartesianProduct")


def test_asof_without_by_key(spark):
    left = spark.createDataFrame([(10,), (1,)], "ts long")
    right = spark.createDataFrame([(5, 1.5)], "ts long, v double")
    out = {r.ts: r.asof_v for r in asof_join(left, right, on="ts").collect()}
    assert out == {10: 1.5, 1: None}
