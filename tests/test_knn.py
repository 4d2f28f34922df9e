"""knn_exact semantics: numpy recall oracle, M1/M2 tiebreaks, TTL + deletes.

Mirrors the reference's golden-path tests (StreamSearchJobTest.testGroundTruth,
SURVEY §5.2): exact mode must have recall@k == 1.0 vs brute force.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vstream_spark.operators.knn import apply_deletes, knn_exact, topk

DIM = 8
N = 300
Q = 12
K = 5


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(7)
    base = rng.rand(N, DIM).astype(np.float32)
    queries = rng.rand(Q, DIM).astype(np.float32)
    return base, queries


@pytest.fixture(scope="module")
def dfs(spark, corpus):
    base, queries = corpus
    vdf = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(N)], "id bigint, emb array<float>"
    )
    qdf = spark.createDataFrame(
        [(i, queries[i].tolist()) for i in range(Q)], "qid bigint, emb array<float>"
    )
    return vdf, qdf


def _numpy_topk(base, queries, k):
    d = ((queries[:, None, :].astype(np.float64) - base[None, :, :].astype(np.float64)) ** 2).sum(
        axis=2
    )
    out = {}
    for qi in range(len(queries)):
        order = np.lexsort((np.arange(len(base)), d[qi]))[:k]
        out[qi] = list(order)
    return out


def test_recall_at_k_is_one(spark, corpus, dfs):
    base, queries = corpus
    vdf, qdf = dfs
    got = knn_exact(vdf, qdf, k=K, metric="l2").collect()
    expected = _numpy_topk(base, queries, K)
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rank, r.neighbor_id))
    for qid, exp_ids in expected.items():
        ids = [nid for _, nid in sorted(by_q[qid])]
        assert ids == exp_ids, f"qid {qid}"


def test_rank_orders_by_distance_then_id(spark):
    rows = [
        (1, 10, 0.5),
        (1, 3, 0.5),  # tie -> smaller id wins
        (1, 7, 0.1),
        (1, 7, 0.3),  # duplicate id -> keep best, drop dup
        (1, 9, 0.9),
    ]
    df = spark.createDataFrame(rows, "qid bigint, neighbor_id bigint, distance double")
    got = [(r.neighbor_id, r.rank) for r in topk(df, 3).orderBy("rank").collect()]
    assert got == [(7, 1), (3, 2), (10, 3)]


def test_per_query_k_column(spark, dfs):
    vdf, qdf = dfs
    qk = qdf.withColumn("k", (F.col("qid") % 3 + 1).cast("int"))
    got = knn_exact(vdf, qk, k=None).groupBy("qid").count().collect()
    for r in got:
        assert r["count"] == r.qid % 3 + 1


def test_apply_deletes_last_writer_wins(spark):
    rows = [
        # id 1: insert then delete -> gone
        (1, [1.0], 100, 10**9, "I"),
        (1, None, 200, 10**9, "D"),
        # id 2: delete then REinsert -> alive
        (2, [2.0], 100, 10**9, "I"),
        (2, None, 150, 10**9, "D"),
        (2, [2.5], 300, 10**9, "I"),
        # id 3: delete at SAME event_time as insert -> insert survives
        # (delete wins only if strictly later, performLocalDeletes:86-96)
        (3, [3.0], 100, 10**9, "I"),
        (3, None, 100, 10**9, "D"),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, emb array<float>, event_time bigint, ttl bigint, op string"
    )
    live = {r.id: r.emb for r in apply_deletes(df).collect()}
    assert set(live) == {2, 3}
    assert live[2] == [2.5]


def test_ttl_window(spark):
    vrows = [(i, [float(i)], i * 100, 10**9, "I") for i in range(1, 11)]
    vdf = spark.createDataFrame(
        vrows, "id bigint, emb array<float>, event_time bigint, ttl bigint, op string"
    )
    # query at t=800 with ttl=300: only event_time in [500, 800] eligible
    qdf = spark.createDataFrame(
        [(0, [0.0], 800, 300, 10)], "qid bigint, emb array<float>, event_time bigint, ttl bigint, k int"
    )
    got = knn_exact(vdf, qdf, k=None, honor_ttl=True).collect()
    ids = sorted(r.neighbor_id for r in got)
    assert ids == [5, 6, 7, 8]
