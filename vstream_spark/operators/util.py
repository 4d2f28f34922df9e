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


def explicit_width(
    df: DataFrame,
    *keys: str,
    n_rows: int | None = None,
    rows_per_task: int | None = None,
    min_bytes_per_row: int = 64,
    stat_df: DataFrame | None = None,
) -> DataFrame:
    """Hash-repartition ``df`` on ``keys`` at an EXPLICIT width — the audited
    guard for the AQE byte-coalescing trap (the companion of :func:`widen`,
    which guards the narrow-INPUT variant).

    The trap (hit four times across r8-r10: ``similarity_join_lsh``,
    ``ngram_jaccard``, ``dedup_semantic``, the bench derived-query lane):
    AQE coalesces a shuffle by its INPUT BYTES, but when the post-shuffle
    stage runs a Python pair loop / O(rows^2) verify / per-group numpy work,
    bytes wildly under-state cost — a few hundred MB of keys coalesce to 1-5
    partitions and the quadratic work serializes onto them (measured 60s
    where 32-wide ran ~10s at sf1). An explicit ``repartition(width, keys)``
    is exempt from AQE coalescing, satisfies downstream
    groupBy/window/applyInPandas clustering on the same keys (no second
    exchange appears), and moves the same bytes either way — only the
    reducer width changes.

    Width policy:
      - default (``rows_per_task=None``): the session's default parallelism
        — for stages whose per-group cost is unknown or pair-quadratic
        (always worth full fan-out; a few idle tasks on small inputs are
        cheaper than a serialized quadratic loop).
      - with ``rows_per_task``: ``ceil(n_rows / rows_per_task)`` clamped to
        [1, parallelism], so the SMALL case isn't taxed with full-width task
        overhead for kilobytes of rows (the r8 lesson: the scale shape must
        not slow the small case). ``n_rows`` comes from the caller when
        known; otherwise from Catalyst plan statistics of ``stat_df or df``
        (NO Spark job — ``plan_stat_rows``; on-disk size divided by a LOWER
        bound on bytes/row, so a mis-estimate only widens, the scale-safe
        direction); when stats are unavailable the width falls back to full
        parallelism (idle tasks beat re-executing lineage for a count).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if rows_per_task is None:
        width = par
    else:
        if n_rows is None:
            rc, size = plan_stat_rows(stat_df if stat_df is not None else df)
            n_rows = (
                rc
                if rc is not None
                else (size // min_bytes_per_row if size is not None else None)
            )
        width = (
            par if n_rows is None else max(1, min(par, -(-n_rows // rows_per_task)))
        )
    return df.repartition(width, *keys) if keys else df.repartition(width)


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
