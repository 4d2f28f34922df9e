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


def plan_stat_rows(df: DataFrame) -> tuple[int | None, int | None]:
    """Catalyst optimized-plan statistics for ``df`` as
    ``(exact_row_count, size_in_bytes)`` — metadata only, NO Spark job.

    ``exact_row_count`` is set when the optimizer knows it (local
    relations, cached plans, ANALYZEd tables); ``size_in_bytes`` is the
    COMPRESSED on-disk size for file scans. Either is ``None`` when
    unavailable, and the Long.Max ``defaultSizeInBytes`` sentinel that
    RDD-backed plans report is mapped to ``None`` too (it means "genuinely
    unknown", not "huge"). Callers divide size by a LOWER bound on on-disk
    bytes/row so a mis-estimate only overestimates rows — every consumer
    here treats more-rows as the scale-safe direction (wider fan-out, the
    approximate path).
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes())
        jrc = stats.rowCount()
        row_count = int(jrc.get()) if jrc.isDefined() else None
    except Exception:  # noqa: BLE001 - stats access is best-effort
        return None, None
    if size >= 2**60:
        size = None
    return row_count, size
