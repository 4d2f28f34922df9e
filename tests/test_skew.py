"""Salted join (skew mitigation) + MaxSim multi-vector retrieval."""

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vstream_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i, float(i)) for i in range(1000)], "k int, rid int, v double"
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(100)], "k int, name string"
    )
    got = salted_join(big, small, on="k", n_salts=8)
    exp = big.join(small, "k")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(1000)], "k int, rid int"
    )
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64("k", "rid"), F.lit(8)).cast("int")
    )
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8  # one hot key really fans out over all salt buckets


def test_salted_join_plan_is_shuffled_hash(spark):
    big = spark.createDataFrame([(i, i) for i in range(100)], "k int, rid int")
    small = spark.createDataFrame([(i,) for i in range(10)], "k int")
    plan = (
        salted_join(big, small, on="k", n_salts=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_maxsim_matches_numpy(spark):
    from vstream_spark.operators.similarity import maxsim_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qm = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") % 20).cast("int").alias("gid"),
        F.col("vec_id").alias("mid"),
        F.col("embedding").alias("emb"),
    )
    dm = emb.select(
        (F.col("vec_id") % 7).cast("int").alias("dgid"),
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
    )
    got = {
        (r.gid, r.rank): r.dgid for r in maxsim_topk(qm, dm, k=3).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    qmask = ids % 10 == 0
    want = {}
    for gid in np.unique(ids[qmask] % 20):
        members = np.where(qmask & (ids % 20 == gid))[0]
        scores = []
        for dgid in np.unique(ids % 7):
            dmemb = np.where(ids % 7 == dgid)[0]
            s = sum(sims[m, dmemb].max() for m in members)
            scores.append((round(s, 6), int(dgid)))
        ranked = sorted(scores, key=lambda t: (-t[0], t[1]))[:3]
        for rk, (_, dgid) in enumerate(ranked, 1):
            want[(int(gid), rk)] = dgid
    assert got == want
