"""Clustering / range-search / projection operators (round-4 part 2)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vstream_spark.operators.cluster import assign_nearest, lloyd_step
from vstream_spark.operators.similarity import range_search


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


def _np_mat(df, col="embedding"):
    rows = df.select("vec_id", col).orderBy("vec_id").collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return ids, mat


def test_assign_nearest_matches_numpy(spark, emb):
    centroids = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cemb")
    )
    got = {
        r.vec_id: r.cluster_id
        for r in assign_nearest(emb, centroids, metric="l2").collect()
    }
    ids, mat = _np_mat(emb)
    cids, cmat = _np_mat(
        emb.filter(F.col("vec_id") % 10 == 0), col="embedding"
    )
    d2 = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    # numpy argmin takes the first index on ties == smallest cluster_id
    want = {int(i): int(cids[j]) for i, j in zip(ids, d2.argmin(axis=1))}
    assert got == want


def test_lloyd_step_means_match_numpy(spark, emb):
    centroids = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cemb")
    )
    out = lloyd_step(emb, centroids, metric="l2", round_dp=None).collect()
    ids, mat = _np_mat(emb)
    cids, cmat = _np_mat(emb.filter(F.col("vec_id") % 10 == 0))
    d2 = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    for r in out:
        members = mat[assign == list(cids).index(r.cluster_id)]
        assert r.n_members == len(members)
        assert abs(r.centroid - members[:, r.dim].mean()) < 1e-9
    # K*D cells exactly (no empty-cluster dropout in this fixture)
    seen = {(r.cluster_id, r.dim) for r in out}
    assert len(seen) == len(out)


def test_range_search_matches_numpy(spark, emb):
    vectors = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("emb")
    )
    radius = 1.4
    got = {
        (r.qid, r.neighbor_id)
        for r in range_search(vectors, queries, radius, metric="l2").collect()
    }
    ids, mat = _np_mat(emb)
    qids, qmat = _np_mat(emb.filter(F.col("vec_id") % 20 == 0))
    d2 = ((qmat[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
    want = {
        (int(qids[i]), int(ids[j]))
        for i, j in zip(*np.where(d2 <= radius + 1e-9))
    }
    # fold vs pairwise summation can differ in the last ulp right at the
    # boundary; tolerate only boundary disagreements
    sym = got.symmetric_difference(want)
    for qid, nid in sym:
        qi = list(qids).index(qid)
        ni = list(ids).index(nid)
        assert abs(d2[qi, ni] - radius) < 1e-6


def test_range_search_plan_has_no_exchange(spark, emb):
    vectors = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("emb")
    )
    plan = range_search(vectors, queries, 1.0)._jdf.queryExecution().executedPlan().toString()
    # no shuffle anywhere (the broadcast exchange is the point, not a shuffle);
    # the radius predicate folds into the BNLJ condition itself
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_random_projection_query_shape(spark):
    from vstream_spark.queries import REGISTRY

    fn, oracle = REGISTRY["emb_random_projection"]
    df = fn(spark, SF_SMALL)
    assert df.columns == ["vec_id"] + [f"p{j}" for j in range(8)]
    row = df.orderBy("vec_id").first()
    # independently recompute p0 for the first vector
    import hashlib

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").orderBy("vec_id").first()
    vec = [float(x) for x in emb.embedding]
    acc = 0.0
    for d in range(64):
        s = 1 if int(hashlib.md5(f"{d}_0".encode()).hexdigest()[0], 16) % 2 == 0 else -1
        acc = acc + vec[d] if s > 0 else acc - vec[d]
    assert abs(row.p0 - round(acc / 8.0, 6)) < 1e-9


def test_lloyd_iterations_reduce_sse(spark, emb):
    """Iterating assign->mean must monotonically reduce the k-means SSE
    (Lloyd's convergence guarantee) — exercises the operator as an actual
    clustering loop, long-form centroids round-tripping to the next fit."""
    import numpy as np
    from pyspark.sql import functions as F

    ids, mat = _np_mat(emb)
    cids, cmat = _np_mat(emb.filter(F.col("vec_id") % 25 == 0))

    def sse(cm):
        d2 = ((mat[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    sses = [sse(cmat)]
    cur = cmat.copy()
    for _ in range(3):
        cdf = spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(cur)],
            "cluster_id int, cemb array<double>",
        )
        cells = lloyd_step(emb, cdf, metric="l2", round_dp=None).collect()
        nxt = cur.copy()
        for r in cells:
            nxt[r.cluster_id, r.dim] = r.centroid
        cur = nxt
        sses.append(sse(cur))
    assert all(b <= a + 1e-9 for a, b in zip(sses, sses[1:])), sses
    assert sses[-1] < sses[0]  # strictly improved over the run


def test_range_search_radius_monotonicity(spark, emb):
    from pyspark.sql import functions as F

    vectors = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("emb")
    )
    small = {
        (r.qid, r.neighbor_id)
        for r in range_search(vectors, queries, 1.0, metric="l2").collect()
    }
    big = {
        (r.qid, r.neighbor_id)
        for r in range_search(vectors, queries, 1.5, metric="l2").collect()
    }
    assert small <= big and len(big) > len(small)
    # reflexivity: every query finds itself at distance 0
    qids = {r.qid for r in queries.collect()}
    assert {(q, q) for q in qids} <= small


def test_pca_fit_matches_numpy(spark):
    """Distributed partial-moment PCA == numpy PCA on the collected matrix:
    same mean, same eigenvalues, components equal up to the sign convention
    (which both paths apply)."""
    import numpy as np

    from vstream_spark.operators.cluster import pca_fit, pca_project

    rng = np.random.RandomState(9)
    # anisotropic data so the spectrum is distinct (no degenerate eigvecs)
    basis = rng.randn(6, 6)
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.2])
    mat = rng.randn(400, 6) * scales @ basis
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    mean, comps, vals = pca_fit(df, k=3)
    # numpy reference
    ref_mean = mat.mean(axis=0)
    cov = np.cov(mat.T, bias=True)
    rv, rvec = np.linalg.eigh(cov)
    order = np.argsort(-rv)[:3]
    ref_comps = rvec[:, order].T.copy()
    for j in range(3):
        i = int(np.argmax(np.abs(ref_comps[j])))
        if ref_comps[j, i] < 0:
            ref_comps[j] = -ref_comps[j]
    assert np.allclose(mean, ref_mean, atol=1e-9)
    assert np.allclose(vals, rv[order], atol=1e-8)
    assert np.allclose(comps, ref_comps, atol=1e-8)
    # projection parity: JVM fold == numpy (X - mean) @ C.T
    proj = pca_project(df, mean, comps).toPandas().sort_values("id")
    got = proj[["pc0", "pc1", "pc2"]].to_numpy()
    want = (mat - ref_mean) @ ref_comps.T
    assert np.allclose(got, want, atol=1e-8)
