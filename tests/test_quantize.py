"""Scalar quantization: roundtrip error bound and ANN usefulness."""

import numpy as np
from pyspark.sql import functions as F

from vstream_spark.operators.quantize import dequantize, quantize


def _vectors(spark, n=100, dim=16):
    rng = np.random.RandomState(3)
    rows = [(int(i), (rng.rand(dim) * 2 - 1).astype(float).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "id long, emb array<float>")


def test_roundtrip_error_bounded(spark):
    v = _vectors(spark)
    rt = dequantize(quantize(v))
    joined = v.alias("a").join(rt.alias("b"), "id").select(
        F.expr(
            "aggregate(zip_with(a.emb, b.emb, (x, y) -> abs(x - y)), "
            "cast(0.0 as double), (acc, d) -> greatest(acc, cast(d as double)))"
        ).alias("max_err"),
        F.expr(
            "aggregate(transform(a.emb, x -> abs(cast(x as double))), "
            "cast(0.0 as double), (acc, d) -> greatest(acc, d)) / 127.0"
        ).alias("half_step"),
    )
    bad = joined.filter(F.col("max_err") > F.col("half_step") * 0.5 + 1e-7).count()
    assert bad == 0  # error <= scale/2 per component


def test_zero_vector_quantizes_to_zero(spark):
    v = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "id long, emb array<float>")
    q = quantize(v).collect()[0]
    assert q.scale == 0.0 and list(q.q) == [0, 0, 0]
    rt = dequantize(quantize(v)).collect()[0]
    assert list(rt.emb) == [0.0, 0.0, 0.0]


def test_knn_over_dequantized_high_recall(spark):
    from vstream_spark.functions.metrics import mean_recall
    from vstream_spark.operators.knn import knn_exact

    v = _vectors(spark, n=200)
    queries = v.filter("id % 20 = 0").selectExpr("id as qid", "emb")
    gt = knn_exact(v, queries, k=5, metric="l2")
    approx = knn_exact(dequantize(quantize(v)), queries, k=5, metric="l2")
    assert mean_recall(approx, gt, 5) >= 0.9
