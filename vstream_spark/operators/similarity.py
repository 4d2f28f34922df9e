"""Similarity search / join over embedding columns (LLM-pipeline surface).

Generalizes the reference's query path (W3 top-k + M1 merge) to:
  * similarity_join_exact — all-pairs above a threshold (the oracle/baseline);
    the scalable path is lsh_similarity_join (bucketed candidates).
  * ann_topk_* — top-k ANN over an embedding column: brute-force baseline
    plus an IVF-probed variant (the scale path for big shards).
  * embedding near-dup — similarity join at a high threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vstream_spark.config import PartitionerConf
from vstream_spark.functions.distance import cosine_similarity
from vstream_spark.operators.partitioned import knn_partitioned_worker
from vstream_spark.partitioners.dispatch import fit_partitioner


def similarity_join_exact(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine-similarity join: (id_a, id_b, cosine_sim >= threshold),
    id_a < id_b. Exact — O(N*M) distance evaluations, JVM-side; use as oracle
    and for small/broadcastable sides. The LSH-bucketed variant bounds the
    candidate set for scale."""
    a = left.select(F.col(left_id).alias("id_a"), F.col(emb_col).alias("emb_a"))
    b = right.select(F.col(right_id).alias("id_b"), F.col(emb_col).alias("emb_b"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    sim = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
    return (
        pairs.withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine_sim")
    )


def lsh_similarity_join(
    vectors: DataFrame,
    threshold: float,
    conf: PartitionerConf | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Self similarity-join with LSH candidate pruning: vectors only pair
    inside a shared LSH partition (with k1 families / multiprobe raising
    recall), then exact cosine verification. Approximate: may miss pairs whose
    members never co-bucket."""
    conf = conf or PartitionerConf(kind="lsh", num_partitions=16, num_families=4)
    part = fit_partitioner(conf)
    df = vectors.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
    bucketed = part.partition_data(df)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.partition_id") == F.col("b.partition_id"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.emb").alias("emb_a"),
            F.col("b.emb").alias("emb_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
    return (
        cand.withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine_sim")
    )


def ann_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    num_partitions: int = 8,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN top-k: kmeans coarse partitioning (route to nearest-R
    centroids), per-partition vectorized scan probing ``nprobe`` cells.
    Returns (qid, neighbor_id, distance, rank); approximate."""
    conf = PartitionerConf(
        kind="kmeans", num_partitions=num_partitions, replication_factor=1
    )
    return knn_partitioned_worker(
        vectors, queries, conf, k=k, metric=metric, nprobe_centroids=nprobe
    )
