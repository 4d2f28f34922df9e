"""fvecs/bvecs/ivecs round-trip through the mapInPandas decoders (S1/S6)."""

import struct

import numpy as np
import pytest

from vstream_spark.sources.fvecs import read_bvecs, read_fvecs, read_ivecs


def _write_xvecs(path, arrays, fmt):
    with open(path, "wb") as f:
        for arr in arrays:
            f.write(struct.pack("<i", len(arr)))
            if fmt == "f":
                f.write(np.asarray(arr, dtype="<f4").tobytes())
            elif fmt == "b":
                f.write(np.asarray(arr, dtype=np.uint8).tobytes())
            else:
                f.write(np.asarray(arr, dtype="<i4").tobytes())


def test_fvecs_roundtrip(spark, tmp_path):
    vecs = [np.random.RandomState(i).rand(8).astype(np.float32) for i in range(5)]
    p = str(tmp_path / "t.fvecs")
    _write_xvecs(p, vecs, "f")
    got = {r.id: r.emb for r in read_fvecs(spark, p).collect()}
    assert len(got) == 5
    for i, v in enumerate(vecs):
        assert np.allclose(got[i], v)


def test_bvecs_widened_to_float(spark, tmp_path):
    vecs = [[1, 2, 3, 255], [0, 128, 7, 9]]
    p = str(tmp_path / "t.bvecs")
    _write_xvecs(p, vecs, "b")
    got = {r.id: r.emb for r in read_bvecs(spark, p).collect()}
    assert got[0] == [1.0, 2.0, 3.0, 255.0]
    assert got[1] == [0.0, 128.0, 7.0, 9.0]


def test_ivecs_groundtruth(spark, tmp_path):
    gts = [[4, 2, 9], [1, 0, 3]]
    p = str(tmp_path / "t.ivecs")
    _write_xvecs(p, gts, "i")
    got = {r.id: r.neighbors for r in read_ivecs(spark, p).collect()}
    assert got[0] == [4, 2, 9] and got[1] == [1, 0, 3]


def test_skip_and_limit(spark, tmp_path):
    vecs = [np.full(4, i, dtype=np.float32) for i in range(10)]
    p = str(tmp_path / "t.fvecs")
    _write_xvecs(p, vecs, "f")
    got = read_fvecs(spark, p, limit=3, skip=2).collect()
    assert len(got) == 3
    vals = sorted(r.emb[0] for r in got)
    assert vals == [2.0, 3.0, 4.0]


def test_sift_golden_path_recall(spark, tmp_path):
    """SIFT-layout golden path (StreamSearchJobTest.java:37-130): base.fvecs +
    query.fvecs + groundtruth.ivecs on disk in the real binary formats, read
    through the S1/S6 decoders, searched with the partitioned HNSW dataflow,
    scored with M3 recall@10 against the ivecs ground truth. No real SIFT
    files ship in this container (documented in TESTDATA.md), so the fixture
    is a deterministic clustered synthetic in the exact same file layout.
    Recall floor 0.85 mirrors the reference accuracy harness
    (VStreamRecallTestJob.java:31-52)."""
    from pyspark.sql import functions as F

    from vstream_spark.config import PartitionerConf, VectorIndexConf
    from vstream_spark.operators.partitioned import knn_partitioned_worker

    rng = np.random.RandomState(123)
    dim, n_base, n_query, k = 16, 1200, 40, 10
    centers = rng.rand(8, dim).astype(np.float32) * 10
    base = np.vstack(
        [centers[i % 8] + rng.randn(dim).astype(np.float32) for i in range(n_base)]
    ).astype(np.float32)
    queries = np.vstack(
        [centers[j % 8] + rng.randn(dim).astype(np.float32) for j in range(n_query)]
    ).astype(np.float32)
    # brute-force L2 ground truth -> groundtruth.ivecs (the dataset's format:
    # row j lists the k nearest base indices of query j)
    d2 = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(axis=2)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :k].astype(np.int32)
    _write_xvecs(str(tmp_path / "base.fvecs"), list(base), "f")
    _write_xvecs(str(tmp_path / "query.fvecs"), list(queries), "f")
    _write_xvecs(str(tmp_path / "groundtruth.ivecs"), list(gt), "i")

    vectors = read_fvecs(spark, str(tmp_path / "base.fvecs"))
    qdf = read_fvecs(spark, str(tmp_path / "query.fvecs")).withColumnRenamed(
        "id", "qid"
    )
    ann = knn_partitioned_worker(
        vectors,
        qdf,
        PartitionerConf(kind="lsh+proximity", num_partitions=4, num_families=2,
                        num_hashes=4, bucket_width=16.0, num_probes=2),
        k=k,
        metric="l2",
        index_conf=VectorIndexConf(dim=dim, m=16, ef_construction=128,
                                   ef_search=64),
    )
    truth = (
        read_ivecs(spark, str(tmp_path / "groundtruth.ivecs"))
        .select(F.col("id").alias("qid"), F.explode("neighbors").alias("_n"))
        .select("qid", F.col("_n").cast("long").alias("neighbor_id"))
    )
    from vstream_spark.functions.metrics import mean_recall

    r = mean_recall(ann, truth, k=k)
    assert r >= 0.85, f"golden-path recall@10 {r:.3f} below floor"
