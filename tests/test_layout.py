"""Z-order layout: multi-column file-skipping effectiveness."""

from pyspark.sql import functions as F

from vstream_spark.storage.layout import files_touched, zorder_layout


def _grid(spark, n=64):
    # n x n integer grid — every (x, y) combination once
    return spark.range(n * n).select(
        (F.col("id") % n).cast("long").alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_both_columns(tmp_path, spark):
    df = _grid(spark)
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_layout(df, ["x", "y"], zpath, n_files=16)
    # baseline: linear sort by x only
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    # x-selective box: both layouts prune
    zx, ztot = files_touched(spark, zpath, {"x": (0, 7)})
    lx, ltot = files_touched(spark, lpath, {"x": (0, 7)})
    assert ztot >= 16 and ltot >= 16
    assert lx <= ltot // 4 and zx <= ztot // 2

    # y-selective box: linear layout reads EVERYTHING, z-order skips
    zy, _ = files_touched(spark, zpath, {"y": (0, 7)})
    ly, _ = files_touched(spark, lpath, {"y": (0, 7)})
    assert ly == ltot  # y uncorrelated with x-sorted files
    assert zy <= ztot // 2  # z-order keeps y ranges tight too

    # 2-d box: multiplicative pruning on the z layout
    zb, _ = files_touched(spark, zpath, {"x": (0, 7), "y": (0, 7)})
    assert zb <= ztot // 4


def test_zorder_layout_preserves_rows(tmp_path, spark):
    df = _grid(spark, n=16)
    path = str(tmp_path / "z2")
    zorder_layout(df, ["x", "y"], path, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 256
    assert back.agg(F.sum("payload")).collect()[0][0] == 255 * 256 // 2
