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


def _sample_rotation() -> list[str]:
    """Registry names ordered least-recorded-first.

    The driver's correctness gate samples a PREFIX of this dict each round,
    so a static order leaves the tail permanently unrecorded (r4: 69 of 123
    queries — including every recall gate — had never appeared in a
    CORRECTNESS artifact). Counting appearances across the committed
    CORRECTNESS_r*.json files and sorting ascending (stable on registration
    order) makes the sample rotate automatically every round until the whole
    registry is on the official record."""
    import glob
    import json
    import os

    counts: dict[str, int] = {name: 0 for name in REGISTRY}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                for name in json.load(f):
                    if name in counts:
                        counts[name] += 1
        except (OSError, ValueError):
            continue
    # recall/consistency gates lead every round (VERDICT r4: the headline
    # gates had never made the official record); everything else rotates by
    # how often it has already been recorded
    gate = {n for n in REGISTRY if n.endswith("_recall") or n.endswith("_gate")}
    order = list(REGISTRY)
    return sorted(order, key=lambda n: (n not in gate, counts[n], order.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (least-recorded
    first, so the driver's prefix sample rotates across rounds)."""
    return {name: REGISTRY[name][0] for name in _sample_rotation()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: REGISTRY[name][1]
        for name in _sample_rotation()
        if REGISTRY[name][1] is not None
    }
