"""As-of (point-in-time) join — a time-series operator Spark lacks natively.

``asof_join(left, right)`` matches every left row to the single right row
with the greatest ``right.ts <= left.ts`` within the same ``by`` key (the
classic trades-to-quotes join; DuckDB/kdb ``ASOF JOIN`` semantics, left
outer flavor).

Physical strategy — the scalable union trick, NOT a range self-join:
tag both sides, union, and run ONE window per key ordered by (ts, side) with
``last(value, ignorenulls=True)`` carrying the latest right values forward
into each left row. Cost: a single hash exchange on the key + one sort —
O((|L|+|R|) log) per partition, no quadratic key-group blowup, no range-join
explosion. Right rows sort before left rows at equal ts so ties match
(asof <=). At 100 TB both sides shuffle once on the same key — AQE handles
skewed keys; a hot single key degrades to its own sorted partition, still
linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + latest right row at-or-before each left timestamp.

    ``right_cols``: right columns to carry (default: all but ``on``/``by``);
    they come back as ``{prefix}{col}`` plus ``{prefix}{on}`` (the matched
    right timestamp), NULL when no right row precedes the left row.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {on, by}]
    keys = [by] if by else []

    lt = left.withColumn("_side", F.lit(1))
    carried = [F.col(on).alias(f"_r_{on}")] + [
        F.col(c).alias(f"_r_{c}") for c in right_cols
    ]
    rt = right.select(*keys, F.col(on), *carried).withColumn("_side", F.lit(0))

    # align schemas: left lacks _r_* columns, right lacks left payload columns
    for c in [f"_r_{on}"] + [f"_r_{c}" for c in right_cols]:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    u = lt.unionByName(rt.select(*lt.columns))

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in [on] + right_cols
        ],
    )
    drop = ["_side", f"_r_{on}"] + [f"_r_{c}" for c in right_cols]
    return filled.filter(F.col("_side") == 1).drop(*drop)
