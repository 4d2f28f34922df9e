"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (partitioned exact kNN over the
sf0.001 embeddings — exchange + co-located search + global top-k merge, the
reference's end-to-end dataflow, SURVEY §3.1). ``queries()`` /
``oracle_sql()`` expose the declared operator inventory from
``vstream_spark.queries.REGISTRY``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vstream_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    knn_partitioned_exact IS the reference's end-to-end dataflow: partition
    exchange -> co-located per-partition search -> global top-k merge."""
    fn, _ = REGISTRY["knn_partitioned_exact"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
