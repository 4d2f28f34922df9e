"""M3 recall@k + S5 result text encoder golden parity."""

import numpy as np

from vstream_spark.functions.metrics import mean_recall, recall_at_k
from vstream_spark.sources.sink import encode_results, write_results


def _results(spark, rows):
    return spark.createDataFrame(
        rows, "qid long, neighbor_id long, distance double, rank int"
    )


def test_recall_at_k_exact_and_partial(spark):
    gt = _results(spark, [(1, 10, 0.1, 1), (1, 11, 0.2, 2), (2, 20, 0.3, 1), (2, 21, 0.4, 2)])
    res = _results(spark, [(1, 10, 0.1, 1), (1, 11, 0.2, 2), (2, 20, 0.3, 1), (2, 99, 0.5, 2)])
    r = {x.qid: x.recall for x in recall_at_k(res, gt, k=2).collect()}
    assert r == {1: 1.0, 2: 0.5}
    assert abs(mean_recall(res, gt, 2) - 0.75) < 1e-12


def test_recall_missing_query_scores_zero(spark):
    gt = _results(spark, [(1, 10, 0.1, 1), (2, 20, 0.2, 1)])
    res = _results(spark, [(1, 10, 0.1, 1)])
    r = {x.qid: x.recall for x in recall_at_k(res, gt, k=1).collect()}
    assert r == {1: 1.0, 2: 0.0}


def test_recall_of_hnsw_vs_exact_on_random(spark):
    from vstream_spark.config import PartitionerConf, VectorIndexConf
    from vstream_spark.operators.knn import knn_exact
    from vstream_spark.operators.partitioned import knn_partitioned_worker

    rng = np.random.RandomState(5)
    rows = [(int(i), rng.rand(12).astype(float).tolist()) for i in range(250)]
    vectors = spark.createDataFrame(rows, "id long, emb array<float>")
    queries = vectors.filter("id % 25 = 0").selectExpr("id as qid", "emb")
    gt = knn_exact(vectors, queries, k=5, metric="l2")
    ann = knn_partitioned_worker(
        vectors, queries, PartitionerConf(kind="simple", num_partitions=2),
        k=5, metric="l2",
        index_conf=VectorIndexConf(dim=12, ef_search=64),
    )
    assert mean_recall(ann, gt, 5) >= 0.9


def test_encoder_golden_format(spark):
    res = _results(
        spark,
        [(7, 3, 0.25, 1), (7, 1, 0.5, 2), (9, 2, 0.0, 1)],
    )
    lines = {r.qid: r.line for r in encode_results(res).collect()}
    # reference format: "<qid> <duration> <id>,<dist> <id>,<dist>"
    assert lines[7] == "7 0 3,0.25 1,0.5"
    assert lines[9] == "9 0 2,0.0"


def test_encoder_orders_by_rank_and_writes(spark, tmp_path):
    res = _results(
        spark,
        [(1, 5, 0.9, 3), (1, 2, 0.1, 1), (1, 4, 0.5, 2)],
    )
    out = str(tmp_path / "results")
    write_results(res, out)
    text = spark.read.text(out).collect()
    assert [r.value for r in text] == ["1 0 2,0.1 4,0.5 5,0.9"]


def test_encoder_duration_column(spark):
    res = spark.createDataFrame(
        [(1, 5, 0.5, 1, 42)],
        "qid long, neighbor_id long, distance double, rank int, duration long",
    )
    assert encode_results(res, "duration").collect()[0].line == "1 42 5,0.5"


def test_mrr_and_ndcg(spark):
    from vstream_spark.functions.metrics import mrr, ndcg_at_k

    gt = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)], "qid long, neighbor_id long"
    )
    res = spark.createDataFrame(
        [
            (1, 10, 1), (1, 99, 2), (1, 11, 3),   # hits at ranks 1 and 3
            (2, 98, 1), (2, 20, 2), (2, 97, 3),   # first hit at rank 2
            (3, 96, 1), (3, 95, 2), (3, 94, 3),   # no hits
        ],
        "qid long, neighbor_id long, rank int",
    )
    rr = {r.qid: r.rr for r in mrr(res, gt).collect()}
    assert rr[1] == 1.0 and rr[2] == 0.5 and rr[3] == 0.0
    import math

    nd = {r.qid: r.ndcg for r in ndcg_at_k(res, gt, k=3).collect()}
    idcg2 = 1.0 / math.log2(2) + 1.0 / math.log2(3)
    assert abs(nd[1] - (1.0 + 1.0 / math.log2(4)) / idcg2) < 1e-12
    assert abs(nd[2] - (1.0 / math.log2(3)) / idcg2) < 1e-12
    assert nd[3] == 0.0
    # perfect ranking scores exactly 1
    perfect = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "qid long, neighbor_id long, rank int"
    )
    nd1 = {r.qid: r.ndcg for r in ndcg_at_k(perfect, gt, k=3).collect()}
    assert abs(nd1[1] - 1.0) < 1e-12
