"""Multi-dimensional data layout (Z-order clustering for file skipping).

Min/max file statistics only prune scans when the layout correlates with
the predicate columns. A linear sort serves ONE column; interleaving the
bits of several columns (the same Morton order the vector partitioners use
over hash space, ``partitioners/curves.py``) gives every interleaved column
partial clustering — the public Delta/Iceberg ``OPTIMIZE ZORDER BY``
technique. At 100 TB layout IS the optimization: a box predicate over two
z-ordered columns touches O(sqrt(files)) instead of O(files).

Pure Catalyst: per-column min/max (one tiny agg) normalizes values to
``bits``-wide ints; the interleave is a fixed chain of shift/mask/or terms
inside whole-stage codegen; the write is ``repartitionByRange`` on the
z-key so each output file covers a contiguous z-range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton (bit-interleave) key over ``cols``, each min/max-normalized to
    [0, 2^bits). One driver-side min/max agg; the key itself is codegen."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    levels = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = float(stats[f"_lo_{c}"]), float(stats[f"_hi_{c}"])
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(levels),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * levels).cast(
                "long"
            ),
        )
        quantized.append(q)
    ndim = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for d, q in enumerate(quantized):
            # bit b of dim d lands at position b*ndim + d: the AND keeps it
            # at position b (value 2^b), so the shift adds b*(ndim-1) + d
            key = key.bitwiseOR(
                F.shiftleft(q.bitwiseAND(F.lit(1 << b)), b * (ndim - 1) + d)
            )
    return key


def zorder_layout(
    df: DataFrame, cols: list[str], path: str, n_files: int = 16, bits: int = 8
) -> None:
    """Rewrite ``df`` into ``n_files`` parquet files clustered by z-order
    over ``cols`` (each file covers a contiguous z-range, so its per-column
    min/max stats are tight on EVERY interleaved column)."""
    keyed = df.withColumn("_zkey", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(path)
    )


def files_touched(
    spark, path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files whose min/max stats intersect the box, total files) — the
    skip-effectiveness measure a layout is judged by."""
    import pyarrow.parquet as pq
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    touched = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        hit = True
        for col, (lo, hi) in predicates.items():
            cmin = min(
                md.row_group(r).column(names[col]).statistics.min
                for r in range(md.num_row_groups)
            )
            cmax = max(
                md.row_group(r).column(names[col]).statistics.max
                for r in range(md.num_row_groups)
            )
            if cmax < lo or cmin > hi:
                hit = False
                break
        if hit:
            touched += 1
    return touched, len(files)
