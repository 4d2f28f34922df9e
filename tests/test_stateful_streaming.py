"""Stateful streaming search (applyInPandasWithState): state persists across
micro-batches; inserts/deletes/queries interleave like the reference stream."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vstream_spark.config import VectorIndexConf
from vstream_spark.streaming.stateful import stateful_vector_search

SCHEMA = (
    "partition_id int, op string, id bigint, emb array<float>, "
    "event_time bigint, ttl bigint"
)


def _run_batches(spark, tmp_path, batches, conf, k=3):
    """Feed micro-batches as one file each (maxFilesPerTrigger=1) and drain."""
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b{i:03d}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_vector_search(stream, conf, k=k, metric="l2")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("select * from stateful_out").toPandas()


def test_state_survives_batches_and_deletes_apply(spark, tmp_path):
    rng = np.random.RandomState(4)
    vecs = [rng.rand(8).astype(np.float32).tolist() for _ in range(30)]
    # batch 0: insert ids 0..19 into partition 0
    b0 = [(0, "I", i, vecs[i], i * 10, 0) for i in range(20)]
    # batch 1: delete id 5, insert 20..29, query near vec 5 and vec 25
    b1 = (
        [(0, "D", 5, None, 500, 0)]
        + [(0, "I", i, vecs[i], i * 10 + 300, 0) for i in range(20, 30)]
        + [
            (0, "Q", 1001, vecs[5], 10_000, 10_000_000),
            (0, "Q", 1002, vecs[25], 10_000, 10_000_000),
        ]
    )
    res = _run_batches(
        spark, tmp_path, [b0, b1], VectorIndexConf(dim=8, ef_search=128), k=3
    )
    by_q = {qid: grp.sort_values("distance") for qid, grp in res.groupby("qid")}
    assert set(by_q) == {1001, 1002}
    # id 5 was deleted in the same batch before the query -> absent;
    # its nearest neighbor is some OTHER id (state from batch 0 still there)
    assert 5 not in set(by_q[1001]["neighbor_id"])
    assert len(by_q[1001]) == 3
    # the batch-1 insert id 25 answers its own query at distance 0
    assert by_q[1002].iloc[0]["neighbor_id"] == 25
    assert by_q[1002].iloc[0]["distance"] == 0.0


def test_ttl_freshness_filter_in_stream(spark, tmp_path):
    rng = np.random.RandomState(7)
    vecs = [rng.rand(8).astype(np.float32).tolist() for _ in range(10)]
    b0 = [(0, "I", i, vecs[i], i * 100, 0) for i in range(10)]
    # query with a tight TTL window: only inserts with event_time >= 900-250
    b1 = [(0, "Q", 2001, vecs[1], 900, 250)]
    res = _run_batches(
        spark, tmp_path, [b0, b1], VectorIndexConf(dim=8, ef_search=128), k=10
    )
    ids = set(res["neighbor_id"])
    assert ids and all(i * 100 >= 650 for i in ids)


def test_exact_stateful_matches_batch_knn(spark, tmp_path):
    """Exact-mode stateful search == batch knn_exact with deletes+TTL: state
    accumulates markers across micro-batches; delete in a later batch wins
    LWW; result merged with topk is bitwise-comparable."""
    import pandas as pd
    from pyspark.sql import functions as F

    from vstream_spark.operators.knn import knn_exact, topk
    from vstream_spark.streaming.stateful import stateful_exact_vector_search

    rng = np.random.RandomState(11)
    vecs = [rng.rand(8).astype(np.float32).tolist() for _ in range(40)]
    num_parts = 2
    b0 = [(i % num_parts, "I", i, vecs[i], i * 10, 0) for i in range(0, 40, 2)]
    b1 = [(i % num_parts, "I", i, vecs[i], i * 10, 0) for i in range(1, 40, 2)] + [
        (3 % num_parts, "D", 3, None, 5000, 0),
        (8 % num_parts, "D", 8, None, 5000, 0),
    ]
    # queries fan to all partitions; TTL window excludes event_time < 100
    b2 = [
        (p, "Q", 900 + j, vecs[j], 10_000, 9_900)
        for j in (0, 7, 15)
        for p in range(num_parts)
    ]
    src = tmp_path / "exsrc"
    src.mkdir()
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b{i:03d}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_exact_vector_search(stream, k=5, metric="l2")
    q = (
        out.writeStream.format("memory")
        .queryName("exact_stateful_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        topk(spark.table("exact_stateful_out"), 5, dedup=False)
        .select("qid", "neighbor_id", "distance", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    vectors = spark.createDataFrame(
        [(i, vecs[i], i * 10, 0, "I") for i in range(40)]
        + [(3, vecs[3], 5000, 0, "D"), (8, vecs[8], 5000, 0, "D")],
        "id bigint, emb array<float>, event_time bigint, ttl bigint, op string",
    )
    queries = spark.createDataFrame(
        [(900 + j, vecs[j], 10_000, 9_900) for j in (0, 7, 15)],
        "qid bigint, emb array<float>, event_time bigint, ttl bigint",
    )
    exp = (
        knn_exact(vectors, queries, k=5, metric="l2", honor_ttl=True, honor_deletes=True)
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64"}), exp.astype({"rank": "int64"})
    )
    # deleted ids and TTL-excluded ids (event_time < 100 -> ids 0..9) absent
    assert {3, 8}.isdisjoint(set(got["neighbor_id"]))
    assert got["neighbor_id"].min() >= 10


def test_partitions_isolated(spark, tmp_path):
    rng = np.random.RandomState(9)
    v = [rng.rand(4).astype(np.float32).tolist() for _ in range(6)]
    b0 = [(0, "I", 0, v[0], 0, 0), (0, "I", 1, v[1], 0, 0),
          (1, "I", 2, v[2], 0, 0), (1, "I", 3, v[3], 0, 0)]
    b1 = [(0, "Q", 3001, v[2], 100, 10**9)]  # asks partition 0 for p1's vector
    res = _run_batches(
        spark, tmp_path, [b0, b1], VectorIndexConf(dim=4, ef_search=64), k=4
    )
    # only partition 0's ids can answer
    assert set(res["neighbor_id"]) <= {0, 1}
    assert set(res["partition_id"]) == {0}


def test_continuous_trigger_matches_availablenow(spark, tmp_path):
    """processingTime-trigger smoke (r10 VERDICT stretch #8): every other
    streaming test drains with availableNow; this pins that the stateful
    search path doesn't silently depend on replay semantics — the same
    interleaved insert/query batches produce the same results under a
    ticking continuous trigger, with state carried across ticks."""
    import time

    rng = np.random.RandomState(9)
    vecs = [rng.rand(8).astype(np.float32).tolist() for _ in range(12)]
    qv = vecs[3]
    batches = [
        # batch 0: inserts only
        [(0, "I", i, vecs[i], 100 + i, 10**9) for i in range(8)],
        # batch 1: more inserts + a query (sees batch-0 state too)
        [(0, "I", i, vecs[i], 200 + i, 10**9) for i in range(8, 12)]
        + [(0, "Q", 1000, qv, 10**6, 10**9)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b{i:03d}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    conf = VectorIndexConf(dim=8, ef_search=64)
    out = stateful_vector_search(stream, conf, k=3, metric="l2")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_pt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from stateful_pt").collect()
            if len(rows) >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = sorted((r.distance, r.neighbor_id) for r in rows if r.qid == 1000)
    # the query's own vector (id 3, inserted in batch 0) must be the nearest
    # hit at distance 0: state crossed the tick boundary
    assert len(got) == 3
    assert got[0] == (0.0, 3)
