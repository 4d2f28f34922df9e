"""Physical-plan auditing — pin the plan shapes the 100 TB story relies on.

The reference has no optimizer (SURVEY §4); on Spark the optimizer IS the
physical layer, so regressions hide in plans, not diffs: a lost broadcast
becomes a sort-merge shuffle of the big side, a lost pushdown reads every
column of every row group. These helpers make plan expectations executable —
tests assert that the operators keep compiling to the intended shape
(`tests/test_plans.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what `.explain()` prints)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def assert_plan_contains(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    """Assert every fragment appears in the physical plan; returns the plan."""
    plan = explain_str(df, mode)
    missing = [f for f in fragments if f not in plan]
    if missing:
        raise AssertionError(
            f"plan is missing {missing!r}; got:\n{plan[:4000]}"
        )
    return plan


def assert_plan_lacks(df: DataFrame, *fragments: str, mode: str = "formatted") -> str:
    """Assert no fragment appears in the physical plan; returns the plan."""
    plan = explain_str(df, mode)
    present = [f for f in fragments if f in plan]
    if present:
        raise AssertionError(
            f"plan unexpectedly contains {present!r}; got:\n{plan[:4000]}"
        )
    return plan


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
