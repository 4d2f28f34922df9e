"""Rate controllers (R1-R3, R5 convention) + monotonic event-time guard."""

import json

import pytest

from vstream_spark.streaming.rate import (
    BindingRateController,
    PollingRateController,
    StagedRateController,
    monotonic_guard,
    rows_per_second,
)


def test_rate_convention():
    # PartitionFunction.java:220-228: >0 recs/s, 0 unlimited, <0 -interval s
    assert rows_per_second(9500) == 9500.0
    assert rows_per_second(0) == float("inf")
    assert rows_per_second(-2) == 0.5


def test_staged_rate_transitions():
    c = StagedRateController(rates=(100.0, 500.0, 50.0), thresholds=(0, 1000, 5000))
    assert c.rate_at(0) == 100.0
    assert c.rate_at(999) == 100.0
    assert c.rate_at(1000) == 500.0
    assert c.rate_at(4999) == 500.0
    assert c.rate_at(5000) == 50.0
    assert c.rate_at(10**9) == 50.0


def test_staged_rate_validation():
    with pytest.raises(ValueError):
        StagedRateController(rates=(1.0,), thresholds=(0, 5))
    with pytest.raises(ValueError):
        StagedRateController(rates=(1.0, 2.0), thresholds=(5, 0))
    with pytest.raises(ValueError):
        StagedRateController(rates=(1.0, 2.0), thresholds=(1, 5))


def test_polling_rate_controller(tmp_path):
    p = tmp_path / "rate.json"
    c = PollingRateController(path=str(p), default_rate=100.0)
    assert c.current_rate() == 100.0  # missing file
    p.write_text(json.dumps(250))
    assert c.current_rate() == 250.0
    p.write_text("garbage")
    assert c.current_rate() == 100.0


def test_binding_rate_controller():
    c = BindingRateController(initial_rate=100.0, new_rate=10.0, insert_threshold=10_000)
    assert c.rate_at(0) == 100.0
    assert c.rate_at(9_999) == 100.0
    assert c.rate_at(10_000) == 10.0


def test_monotonic_guard_drops_out_of_order(spark):
    rows = [
        (1, 100), (2, 200), (3, 150),  # 3 arrives with older event time -> drop
        (4, 200), (5, 300), (6, 250),  # 6 older than running max 300 -> drop
    ]
    q = spark.createDataFrame(rows, "qid long, event_time long")
    kept = sorted(r.qid for r in monotonic_guard(q).collect())
    assert kept == [1, 2, 4, 5]


def test_monotonic_guard_keeps_equal_times(spark):
    q = spark.createDataFrame([(1, 100), (2, 100), (3, 100)], "qid long, event_time long")
    assert monotonic_guard(q).count() == 3


def test_throttled_rate_source_builds_stream(spark):
    from vstream_spark.streaming.rate import throttled_rate_source

    c = StagedRateController(rates=(100.0, 5.0), thresholds=(0, 10))
    df = throttled_rate_source(spark, c, progress=50)
    assert df.isStreaming
    with pytest.raises(TypeError):
        throttled_rate_source(spark, object())


def test_streaming_ingest_then_segment_search_e2e(spark, tmp_path):
    """inserts stream -> segments -> guarded query batch -> HNSW segment
    search: the full VStreamSearchJob shape (SURVEY §3.1) on Spark."""
    import numpy as np

    from vstream_spark.config import VectorIndexConf
    from vstream_spark.storage.search import SegmentSearcher
    from vstream_spark.storage.segments import SegmentStore
    from vstream_spark.streaming.pipeline import StreamingVectorIngest

    rng = np.random.RandomState(1)
    schema = "id bigint, emb array<float>, event_time bigint, ttl bigint, op string"
    rows = [
        (i, rng.rand(8).astype(np.float32).tolist(), i * 10, 10**12, "I")
        for i in range(120)
    ]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(rows[:60], schema).write.parquet(str(src_dir / "a"))
    spark.createDataFrame(rows[60:], schema).write.parquet(str(src_dir / "b"))

    store = SegmentStore(spark, str(tmp_path / "segments"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    q = StreamingVectorIngest(store).start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert len(store.segments()) >= 2  # one segment per micro-batch

    queries = spark.createDataFrame(
        [(1, rows[7][1], 1100), (2, rows[80][1], 1200), (3, rows[9][1], 1150)],
        "qid long, emb array<float>, event_time long",
    )
    from vstream_spark.streaming.rate import monotonic_guard

    guarded = monotonic_guard(queries)  # qid 3 out of order -> dropped
    assert sorted(r.qid for r in guarded.collect()) == [1, 2]
    searcher = SegmentSearcher(
        store, VectorIndexConf(dim=8, ef_search=256, termination_lower_bound=1.0)
    )
    res = searcher.search(guarded.select("qid", "emb"), k=3, metric="l2")
    by_q = {qid: grp for qid, grp in res.groupby("qid")}
    assert set(by_q) == {1, 2}
    assert by_q[1].iloc[0]["neighbor_id"] == 7  # self is nearest
    assert by_q[2].iloc[0]["neighbor_id"] == 80
