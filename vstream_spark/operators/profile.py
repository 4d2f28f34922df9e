"""Single-pass table profiling (data-quality stats for pipeline curation).

Every large-scale ingest needs a cheap profile of what just landed — row
count, per-column null rate, distinct cardinality — before any curation
decision. The operator computes ALL columns' stats in ONE aggregation pass
(one scan at 100 TB, partial-aggregated map-side) and unpivots the single
wide row into long form with ``stack``, so the result is O(columns) rows
regardless of table size.

Exact ``count_distinct`` is declared here because the oracle needs bitwise
parity; the documented 100 TB switch is ``approx_count_distinct`` (HLL++,
one mergeable sketch per column — see ``approx_distinct_gate`` for the
accuracy contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation pass.

    Returns (column_name, n_rows, n_null, n_distinct) — one row per column.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_null, n_distinct)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct")
