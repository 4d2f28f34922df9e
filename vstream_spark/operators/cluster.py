"""Embedding-space clustering operators (corpus curation / coarse quantizer).

Training-data pipelines cluster document embeddings to (a) balance topic
mixture, (b) drop degenerate clusters, (c) build IVF coarse quantizers
(``index/ivf.py`` trains its own centroids with the same assignment rule;
reference analog: the kmeans partitioner, ``KMeansPartitioner.java`` — routing
a vector to its nearest centroid is exactly this operator at R=1).

Everything here is pure Catalyst: centroids are broadcast into a nested-loop
join, the argmin is a rank-1 window, and the Lloyd mean update is a
``posexplode`` + per-(cluster, dim) partial aggregation — one shuffle keyed by
(cluster_id, dim), which at 100 TB is K*D cells of double accumulators, i.e.
map-side combine reduces the shuffle to O(K*D) per task regardless of row
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vstream_spark.functions.distance import distance_expr


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    metric: str = "l2",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
    centroid_emb_col: str = "cemb",
) -> DataFrame:
    """Assign every row to its nearest centroid.

    Returns (id_col, cluster_id, distance). Ties break to the smaller
    cluster_id (same tiebreak as the kNN merge, M1). The centroid table is
    broadcast — the big side never shuffles; the only exchange is the rank-1
    window, partitioned by the (high-cardinality) row id, so it re-uses the
    scan partitioning under AQE and never skews.
    """
    # same BNLJ parallelism trap as the other brute-force consumers
    # (SCALE.md r4 note): the streamed side's input splits drive the
    # O(N x K) distance loop AND the rank-1 window that follows it — a
    # 2-split parquet scan serialized emb_cluster_assign to 79s at sf1
    # where the widened plan runs in seconds. No-op at real scale.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    pairs = df.alias("v").join(F.broadcast(centroids.alias("c")), F.lit(True), "inner")
    scored = pairs.select(
        F.col(f"v.{id_col}").alias(id_col),
        F.col(f"c.{centroid_id_col}").alias("cluster_id"),
        distance_expr(
            F.col(f"v.{emb_col}"), F.col(f"c.{centroid_emb_col}"), metric
        ).alias("distance"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("cluster_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lloyd_step(
    df: DataFrame,
    centroids: DataFrame,
    metric: str = "l2",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """One Lloyd iteration: assign to nearest centroid, then per-dimension
    mean of the members. Returns (cluster_id, dim, centroid, n_members) in
    long form — K*D cells, the shape a driver-side ``collect`` can afford at
    any scale (K*D doubles, independent of row count).

    The mean runs as a single groupBy(cluster_id, dim) over posexploded
    elements: partial aggregation (sum, count) happens map-side, so the
    shuffle volume is O(K * D * tasks), not O(rows * D).
    """
    assigned = assign_nearest(df, centroids, metric=metric, id_col=id_col, emb_col=emb_col)
    members = assigned.select(id_col, "cluster_id").join(
        df.select(id_col, emb_col), id_col
    )
    flat = members.select(
        "cluster_id",
        F.posexplode(F.col(emb_col)).alias("dim", "_val"),
    ).select("cluster_id", "dim", F.col("_val").cast("double").alias("_val"))
    out = flat.groupBy("cluster_id", "dim").agg(
        F.avg("_val").alias("centroid"), F.count("*").alias("n_members")
    )
    if round_dp is not None:
        out = out.withColumn(
            "centroid", F.round(F.col("centroid"), round_dp).cast("double")
        )
    return out


def pca_fit(
    vectors: DataFrame, k: int, emb_col: str = "embedding"
) -> tuple["object", "object", "object"]:
    """Distributed PCA fit: returns (mean, components, eigenvalues) as numpy
    arrays — O(D) + O(k*D) + O(k) driver state.

    The covariance never materializes row-wise: each Arrow batch contributes
    ONE partial (sum vector, raw-moment matrix, count) via mapInPandas —
    numpy outer-product work executor-side — and only O(batches * D^2)
    accumulator cells shuffle (D=64 -> 4096 doubles per batch). The driver
    assembles cov = E[xx^T] - mean mean^T and runs the tiny D x D ``eigh``.
    Deterministic: eigh on the same matrix plus a sign convention (largest
    |component| entry made positive, ties to the lower index)."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            s = mat.sum(axis=0)
            m2 = mat.T @ mat
            n = len(mat)
            d = len(s)
            idx = np.arange(d * d + d + 1, dtype=np.int64)
            val = np.concatenate([m2.ravel(), s, [float(n)]])
            yield pd.DataFrame({"idx": idx, "val": val})

    d_probe = len(vectors.select(emb_col).first()[0])
    cells = (
        vectors.select(emb_col)
        .mapInPandas(partials, "idx long, val double")
        .groupBy("idx")
        .agg(F.sum("val").alias("v"))
        .collect()
    )
    import numpy as np

    acc = np.zeros(d_probe * d_probe + d_probe + 1)
    for r in cells:
        acc[int(r["idx"])] = float(r["v"])
    n = acc[-1]
    mean = acc[d_probe * d_probe : -1] / n
    raw = acc[: d_probe * d_probe].reshape(d_probe, d_probe) / n
    cov = raw - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-vals, kind="stable")[:k]
    comps = vecs[:, order].T.copy()
    for j in range(len(comps)):  # sign convention: dominant entry positive
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    return mean, comps, vals[order]


def pca_project(
    vectors: DataFrame,
    mean,
    components,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-only projection onto the fitted components: for each component a
    JVM ``zip_with``/``aggregate`` fold of (x - mean) . c — whole-stage
    codegen, no Python, no shuffle. Returns (id, pc0..pc{k-1})."""
    cols = [F.col(id_col).alias("id")]
    for j, comp in enumerate(components):
        centered = F.zip_with(
            F.col(emb_col),
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda x, m: x.cast("double") - m,
        )
        prods = F.zip_with(
            centered,
            F.array(*[F.lit(float(c)) for c in comp]),
            lambda v, c: v * c,
        )
        cols.append(
            F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v).alias(f"pc{j}")
        )
    return vectors.select(*cols)
