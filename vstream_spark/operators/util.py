"""Shared plan-shape helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default parallelism
    when its current partitioning is narrower — identity otherwise.

    The trap this guards (SCALE.md r4, re-hit every scale rehearsal since):
    a small parquet projection reads as 1-2 input splits, and any O(rows) or
    O(pairs) consumer downstream — a Python ``mapInPandas`` decode loop, a
    broadcast-NLJ distance scan, a per-pair hash — inherits that width and
    serializes onto one or two tasks. On a real cluster big inputs are
    already many-splits and this is a no-op; on narrow inputs it costs one
    round-robin exchange of the (small) frame and buys full fan-out.

    Deliberately NOT applied blindly inside every operator: callers place it
    on the side whose partition count drives the expensive loop.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
