"""Distance expressions vs numpy ground truth (SURVEY §1.2 distance spaces)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vstream_spark.functions.distance import distance_expr

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 6.0, 8.0]),
    ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    ([1.5, -2.5, 0.5], [-1.5, 2.5, -0.5]),
]


def _df(spark):
    return spark.createDataFrame(
        [(a, b) for a, b in VECS], "a array<float>, b array<float>"
    )


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_distance_matches_numpy(spark, metric):
    out = (
        _df(spark)
        .select(distance_expr(F.col("a"), F.col("b"), metric).alias("d"))
        .collect()
    )
    for row, (a, b) in zip(out, VECS):
        av = np.asarray(a, dtype=np.float32).astype(np.float64)
        bv = np.asarray(b, dtype=np.float32).astype(np.float64)
        if metric == "l2":
            exp = ((av - bv) ** 2).sum()
        elif metric == "ip":
            exp = 1.0 - av @ bv
        else:
            denom = np.linalg.norm(av) * np.linalg.norm(bv)
            exp = 1.0 - ((av @ bv) / denom if denom else 0.0)
        assert row["d"] == pytest.approx(exp, rel=1e-12)


def test_unknown_metric_raises(spark):
    with pytest.raises(ValueError):
        distance_expr(F.col("a"), F.col("b"), "manhattan")
