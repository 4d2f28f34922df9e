"""Partitioner unit tests (SURVEY §5.1 analog: curves, LSH, balance)."""

import numpy as np
import pytest

from vstream_spark.config import PartitionerConf
from vstream_spark.partitioners.curves import (
    gray_index,
    hilbert_index,
    peano_index,
    zorder_index,
)
from vstream_spark.partitioners.dispatch import fit_partitioner
from vstream_spark.partitioners.lsh import LSHFamilies


# --- curves ------------------------------------------------------------------


def _grid(bits, ndim):
    side = 1 << bits
    pts = np.array(
        [[(i >> (d * bits)) & (side - 1) for d in range(ndim)] for i in range(side**ndim)]
    )
    return pts


@pytest.mark.parametrize("curve", [zorder_index, gray_index, hilbert_index])
def test_curve_is_bijection(curve):
    pts = _grid(3, 2)  # 8x8 grid
    idx = curve(pts, 3)
    assert len(set(int(v) for v in idx)) == 64
    assert min(int(v) for v in idx) == 0
    assert max(int(v) for v in idx) == 63


def test_peano_is_bijection_on_ternary_grid():
    # native ternary grid: 9x9 points, bits chosen so 3^levels == 2^bits scale
    pts = np.array([[x, y] for x in range(8) for y in range(8)])
    idx = peano_index(pts, 3)
    # not a strict bijection after rescaling 2^3 -> 3^2 grid, but must be
    # deterministic and well-spread
    assert len(set(int(v) for v in idx)) >= 32


def test_hilbert_adjacency():
    """Consecutive Hilbert indices are adjacent grid cells (the locality
    property the equi-depth partitioner relies on)."""
    pts = _grid(3, 2)
    idx = hilbert_index(pts, 3)
    by_idx = {int(v): tuple(pts[i]) for i, v in enumerate(idx)}
    for h in range(63):
        (x1, y1), (x2, y2) = by_idx[h], by_idx[h + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, f"index {h} not adjacent"


def test_zorder_known_values():
    # interleave: (x=1,y=0) -> 1, (0,1) -> 2, (1,1) -> 3, (2,2) -> 12
    pts = np.array([[1, 0], [0, 1], [1, 1], [2, 2]])
    assert [int(v) for v in zorder_index(pts, 2)] == [1, 2, 3, 12]


# --- LSH ---------------------------------------------------------------------


def test_lsh_deterministic_and_query_aligned():
    conf = PartitionerConf(kind="lsh", num_partitions=8, num_families=4, num_hashes=4)
    fams1 = LSHFamilies(16, conf)
    fams2 = LSHFamilies(16, conf)
    rng = np.random.RandomState(0)
    mat = rng.rand(50, 16)
    p1 = fams1.partitions(mat)
    p2 = fams2.partitions(mat)
    assert p1 == p2  # seeded -> identical across instances (and executors)


def test_lsh_close_vectors_share_partitions():
    conf = PartitionerConf(
        kind="lsh", num_partitions=8, num_families=4, num_hashes=4, bucket_width=4.0
    )
    fams = LSHFamilies(16, conf)
    rng = np.random.RandomState(1)
    v = rng.rand(1, 16)
    near = v + rng.randn(1, 16) * 1e-4
    far = rng.rand(1, 16) * 10
    pv = fams.partitions(np.vstack([v, near, far]))
    assert pv[0] & pv[1], "near-identical vectors must co-bucket"


def test_multiprobe_superset():
    conf = PartitionerConf(kind="lsh", num_partitions=8, num_families=2, num_hashes=4)
    fams = LSHFamilies(8, conf)
    mat = np.random.RandomState(2).rand(20, 8)
    base = fams.partitions(mat, probes=0)
    probed = fams.partitions(mat, probes=1)
    for b, p in zip(base, probed):
        assert b <= p


# --- fitted partitioners over Spark ------------------------------------------


def _vector_df(spark, n=400, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    return spark.createDataFrame(
        [(i, rng.rand(dim).astype(np.float32).tolist(), i * 1000) for i in range(n)],
        "id bigint, emb array<float>, event_time bigint",
    )


def test_simple_partitioner_full_fanout(spark):
    conf = PartitionerConf(kind="simple", num_partitions=4)
    part = fit_partitioner(conf)
    df = _vector_df(spark, 50)
    pd_ = part.partition_data(df)
    assert pd_.select("partition_id").distinct().count() == 4
    q = df.selectExpr("id as qid", "emb")
    pq = part.partition_queries(q)
    assert pq.count() == 50 * 4
    assert pq.select("num_partitions_sent").distinct().collect()[0][0] == 4


@pytest.mark.parametrize("kind", ["lsh+hilbert", "lsh+zorder", "hilbert"])
def test_curve_partitioner_balance_and_routing(spark, kind):
    conf = PartitionerConf(
        kind=kind, num_partitions=4, num_hashes=2, sfc_bits=7, bucket_width=0.5
    )
    df = _vector_df(spark, 400)
    part = fit_partitioner(conf, df)
    counts = {
        r.partition_id: r["count"]
        for r in part.partition_data(df).groupBy("partition_id").count().collect()
    }
    assert len(counts) == 4
    # equi-depth: no partition more than 2.5x the ideal share
    assert max(counts.values()) <= 2.5 * (400 / 4)
    # query fan-out covers every epoch's partition; single epoch when no
    # event_time on the query side -> at least 1 pid each
    q = df.selectExpr("id as qid", "emb").limit(20)
    pq = part.partition_queries(q)
    assert pq.count() >= 20


def test_kmeans_partitioner_clusters(spark):
    conf = PartitionerConf(kind="kmeans", num_partitions=3, replication_factor=2)
    df = _vector_df(spark, 200)
    part = fit_partitioner(conf, df)
    pdata = part.partition_data(df)
    # replication_factor=2 -> every row lands in exactly 2 partitions
    assert pdata.count() == 400
    assert pdata.select("partition_id").distinct().count() == 3


# --- SAX / Odyssey (P8) -------------------------------------------------------


def test_sax_words_deterministic_and_locality():
    from vstream_spark.partitioners.sax import sax_words

    rng = np.random.RandomState(7)
    mat = rng.rand(100, 16)
    w1 = sax_words(mat, 8, 4)
    w2 = sax_words(mat, 8, 4)
    assert (w1 == w2).all()
    # scale/offset invariance from z-normalization (SAX property)
    w3 = sax_words(mat * 5.0 + 3.0, 8, 4)
    assert (w1 == w3).all()
    # a vector equals itself's word; a tiny perturbation usually keeps the word
    near = mat + rng.randn(100, 16) * 1e-9
    assert (sax_words(near, 8, 4) == w1).all()


def test_sierpinski_bijection_and_determinism():
    from vstream_spark.partitioners.curves import sierpinski_index

    pts = _grid(3, 2)
    idx = sierpinski_index(pts, 3)
    # distinct index per cell (the curve resolves the full 8x8 grid)
    assert len(set(int(v) for v in idx)) == 64


def test_odyssey_partitioner_group_replication(spark):
    conf = PartitionerConf(kind="odyssey", num_partitions=6, replication_factor=2)
    df = _vector_df(spark, 120)
    part = fit_partitioner(conf, df)
    pdata = part.partition_data(df)
    # every record replicated to exactly its group's 2 members
    assert pdata.count() == 240
    per_id = pdata.groupBy("id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_id] == [2]
    # queries visit exactly one member per group (3 groups)
    q = df.selectExpr("id as qid", "emb").limit(10)
    pq = part.partition_queries(q)
    assert pq.groupBy("qid").count().select("count").distinct().collect()[0][0] == 3
    assert pq.select("num_partitions_sent").distinct().collect()[0][0] == 3


def test_odyssey_pipeline_is_exact(spark):
    from vstream_spark.operators.knn import knn_exact
    from vstream_spark.operators.partitioned import knn_partitioned

    df = _vector_df(spark, 150)
    q = df.selectExpr("id as qid", "emb").filter("qid % 10 = 0")
    conf = PartitionerConf(kind="odyssey", num_partitions=4, replication_factor=2)
    got = knn_partitioned(df, q, conf, k=5, metric="l2").orderBy("qid", "rank")
    want = knn_exact(df, q, k=5, metric="l2").orderBy("qid", "rank")
    g = [(r.qid, r.neighbor_id, r.rank) for r in got.collect()]
    w = [(r.qid, r.neighbor_id, r.rank) for r in want.collect()]
    assert g == w


# --- balance diagnostics ------------------------------------------------------


def test_partition_balance_stats(spark):
    from vstream_spark.partitioners.dispatch import balance_factor, partition_balance

    conf = PartitionerConf(kind="simple", num_partitions=4)
    df = _vector_df(spark, 400)
    part = fit_partitioner(conf)
    pdata = part.partition_data(df)
    stats = partition_balance(pdata)
    assert stats.count() == 4
    total = sum(r.n for r in stats.collect())
    assert total == 400
    bf = balance_factor(pdata)
    assert 1.0 <= bf < 2.0  # hash routing is near-uniform


def test_curve_partitioner_epoch_freshness_pruning(spark):
    """P5 isFresh (LSHashSpaceFillingPartitioner.java:353-355): queries skip
    epochs that cannot hold data in [event_time - max_ttl, event_time]."""
    rng = np.random.RandomState(21)
    # three epochs of data: event_time in [0, 100), [100, 200), [200, 300)
    rows = [
        (int(i), rng.rand(8).astype(float).tolist(), int(i % 3) * 100 + int(i) % 100)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, emb array<float>, event_time long")
    conf = PartitionerConf(
        kind="lsh+zorder", num_partitions=4, num_hashes=2, bucket_width=2.0,
        sfc_bits=4, update_interval=100, max_ttl=120,
    )
    part = fit_partitioner(conf, df)
    assert len(part.boundaries) == 3  # one boundary set per epoch
    # a query at t=250 with max_ttl=120 sees [130, 250]: epochs 1 and 2 only
    q = spark.createDataFrame(
        [(1, rows[0][1], 250)], "qid long, emb array<float>, event_time long"
    )
    pq = part.partition_queries(q)
    fresh_fanout = pq.count()
    # same query with pruning disabled fans to all three epochs' partitions
    conf_all = PartitionerConf(
        kind="lsh+zorder", num_partitions=4, num_hashes=2, bucket_width=2.0,
        sfc_bits=4, update_interval=100, max_ttl=None,
    )
    part_all = fit_partitioner(conf_all, df)
    all_fanout = part_all.partition_queries(q).count()
    assert 0 < fresh_fanout <= all_fanout
    # a query far in the future of every epoch sees nothing
    q_old = spark.createDataFrame(
        [(2, rows[0][1], 10_000)], "qid long, emb array<float>, event_time long"
    )
    assert part.partition_queries(q_old).count() == 0


def test_curve_partitioner_end_to_end_under_ttl_churn(spark):
    """P5 epoch dynamics, end to end: boundaries re-learned per epoch under
    distribution drift, query fan-out limited to fresh epochs, and the
    partitioned TTL search stays complete w.r.t. the exact TTL answer."""
    from vstream_spark.operators.knn import knn_exact
    from vstream_spark.operators.partitioned import knn_partitioned

    rng = np.random.RandomState(33)
    rows = []
    for i in range(600):
        ep = i % 3  # epochs [0,100) [100,200) [200,300)
        # drifting distribution: each epoch's vectors shift by +0.5/epoch
        v = (rng.rand(8) + 0.5 * ep).astype(float).tolist()
        rows.append((int(i), v, ep * 100 + int(i) % 100, 10**6))
    vectors = spark.createDataFrame(
        rows, "id long, emb array<float>, event_time long, ttl long"
    )
    conf = PartitionerConf(
        kind="lsh+hilbert", num_partitions=4, num_hashes=2, bucket_width=2.0,
        sfc_bits=4, update_interval=100, max_ttl=120, replication_factor=2,
    )
    part = fit_partitioner(conf, vectors)
    # drift is visible to the partitioner: epoch boundary sets differ
    assert len(part.boundaries) == 3
    assert part.boundaries[0] != part.boundaries[2]

    # queries at t=250 (fresh window [130, 250] -> epochs 1 and 2 only)
    qrows = [
        (int(j), (rng.rand(8) + 1.0).astype(float).tolist(), 250, 120)
        for j in range(20)
    ]
    queries = spark.createDataFrame(
        qrows, "qid long, emb array<float>, event_time long, ttl long"
    )
    got = knn_partitioned(
        vectors, queries, conf, k=5, metric="l2", honor_ttl=True
    ).toPandas()
    want = knn_exact(
        vectors, queries, k=5, metric="l2", honor_ttl=True
    ).toPandas()
    # freshness invariant is EXACT: no stale or future neighbor, ever
    et = {r[0]: r[2] for r in rows}
    assert all(130 <= et[n] <= 250 for n in got["neighbor_id"])
    # completeness: curve fan-out with replication recovers most of the
    # true fresh top-k (deterministic seed; exact only at full replication)
    g = set(zip(got["qid"], got["neighbor_id"]))
    w = set(zip(want["qid"], want["neighbor_id"]))
    assert len(g & w) / len(w) >= 0.6
    # fan-out accounting: fresh-epoch pruning sends each query to fewer
    # partition copies than the same conf with pruning off
    sent = part.partition_queries(queries).groupBy("qid").count().toPandas()
    conf_all = PartitionerConf(
        kind="lsh+hilbert", num_partitions=4, num_hashes=2, bucket_width=2.0,
        sfc_bits=4, update_interval=100, max_ttl=None, replication_factor=2,
    )
    sent_all = (
        fit_partitioner(conf_all, vectors)
        .partition_queries(queries).groupBy("qid").count().toPandas()
    )
    assert sent["count"].sum() <= sent_all["count"].sum()


def test_curve_partitioner_full_replication_is_exact_under_ttl(spark):
    """At replication_factor = num_partitions the fan-out covers every
    partition of every fresh epoch — the TTL answer must be EXACT."""
    from vstream_spark.operators.knn import knn_exact
    from vstream_spark.operators.partitioned import knn_partitioned

    rng = np.random.RandomState(7)
    rows = [
        (int(i), (rng.rand(8) + 0.3 * (i % 3)).astype(float).tolist(),
         (i % 3) * 100 + int(i) % 100, 10**6)
        for i in range(300)
    ]
    vectors = spark.createDataFrame(
        rows, "id long, emb array<float>, event_time long, ttl long"
    )
    queries = spark.createDataFrame(
        [(int(j), (rng.rand(8) + 0.3).astype(float).tolist(), 220, 150)
         for j in range(10)],
        "qid long, emb array<float>, event_time long, ttl long",
    )
    conf = PartitionerConf(
        kind="lsh+zorder", num_partitions=4, num_hashes=2, bucket_width=2.0,
        sfc_bits=4, update_interval=100, max_ttl=150, replication_factor=4,
    )
    got = knn_partitioned(
        vectors, queries, conf, k=5, metric="l2", honor_ttl=True
    ).toPandas()
    want = knn_exact(vectors, queries, k=5, metric="l2", honor_ttl=True).toPandas()
    assert set(zip(got["qid"], got["neighbor_id"])) == set(
        zip(want["qid"], want["neighbor_id"])
    )


def test_fit_cache_reuses_and_invalidates(spark, tmp_path):
    """The fitted-state memo (r15: _FIT_CACHE) returns the SAME centroids
    object for an identical (session, plan, file mtime, params) fit, keys
    distinct params separately, and misses after the input file changes —
    the plan-cache staleness discipline applied to partitioner fits."""
    import os
    import time

    from vstream_spark.partitioners.dispatch import _FIT_CACHE, fit_partitioner

    rng = np.random.RandomState(3)
    p = str(tmp_path / "vec.parquet")
    spark.createDataFrame(
        [(int(i), [float(x) for x in rng.rand(8)]) for i in range(120)],
        "id bigint, emb array<double>",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    conf = PartitionerConf(kind="kmeans", num_partitions=3, replication_factor=1)
    n0 = len(_FIT_CACHE)
    c1 = fit_partitioner(conf, df).centroids
    assert len(_FIT_CACHE) == n0 + 1
    c2 = fit_partitioner(conf, df).centroids
    assert c2 is c1  # exact reuse, not a refit
    # different fit params -> its own entry
    conf4 = PartitionerConf(kind="kmeans", num_partitions=4, replication_factor=1)
    c4 = fit_partitioner(conf4, df).centroids
    assert c4 is not c1 and len(_FIT_CACHE) == n0 + 2
    # rewriting the file invalidates (mtime/size key component)
    time.sleep(0.05)
    os.utime(next(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    ))
    df2 = spark.read.parquet(p)
    c5 = fit_partitioner(conf, df2).centroids
    assert c5 is not c1
    # non-file inputs (local relations) skip the cache rather than risk
    # an unsound key
    local = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.rand(8)]) for i in range(60)],
        "id bigint, emb array<double>",
    )
    n_before = len(_FIT_CACHE)
    fit_partitioner(conf, local)
    assert len(_FIT_CACHE) == n_before
